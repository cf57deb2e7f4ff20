"""rbg PRNG switch (utils/prng.py): the TPU-native RngBitGenerator dropout
path must train identically in distribution to threefry — same shapes, finite
losses, params actually move — because the CLIs/bench default to it for the
measured -27% step time (v5e, r5 device trace).

The reference has no bitwise RNG stream to preserve (cuDNN dropout,
SPMM_models.py training path), so equality is structural, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig, PretrainConfig
from spmm_tpu.parallel.mesh import data_parallel_mesh
from spmm_tpu.training.pretrain import init_pretrain_state, make_pretrain_step
from spmm_tpu.utils.prng import PRNG_CHOICES, set_default_prng

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
TEXT_CFG = BertArchConfig(**TINY, add_cross_attention=True)
PROP_CFG = BertArchConfig(**{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
                          add_cross_attention=False)
PCFG = PretrainConfig(embed_dim=16, queue_size=64, batch_size=2,
                      warmup_epochs=2)


@pytest.fixture
def rbg_default():
    """Flip the process-global default to rbg and restore threefry after
    (other tests' goldens assume the threefry default)."""
    set_default_prng("rbg")
    try:
        yield
    finally:
        set_default_prng("threefry")


def test_set_default_prng_rejects_unknown():
    with pytest.raises(ValueError):
        set_default_prng("xoshiro")
    assert "rbg" in PRNG_CHOICES and "threefry" in PRNG_CHOICES


def test_rbg_key_shape(rbg_default):
    # rbg keys are uint32[4] (threefry: uint32[2]); fold_in/split must work
    key = jax.random.PRNGKey(0)
    assert key.shape == (4,)
    k2 = jax.random.fold_in(key, 7)
    ks = jax.random.split(k2, 13)
    assert ks.shape == (13, 4)


def test_train_step_under_rbg(rbg_default):
    """Full (tiny) pretrain step on the 8-device mesh with dropout ON under
    rbg: finite losses, params move — the exact graph bench.py/cli.pretrain
    now run by default."""
    state = init_pretrain_state(jax.random.PRNGKey(0), PCFG, TEXT_CFG,
                                PROP_CFG)
    mesh = data_parallel_mesh(8)
    step_fn = make_pretrain_step(mesh, PCFG, steps_per_epoch=10,
                                 text_cfg=TEXT_CFG, prop_cfg=PROP_CFG)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    ids = jax.random.randint(k1, (16, 12), 4, 300).at[:, 0].set(2)
    batch = {"prop": jax.random.normal(k2, (16, 53)), "ids": ids,
             "mask": jnp.ones((16, 12), jnp.int32)}
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert not bool(metrics["skipped"])
    for k in ("loss", "loss_mlm", "loss_mpm", "loss_ita", "loss_itm"):
        assert np.isfinite(float(metrics[k])), k
    moved = jnp.abs(new_state["params"]["text_proj"]["w"]
                    - state["params"]["text_proj"]["w"]).max()
    assert float(moved) > 0
