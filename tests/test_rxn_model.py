"""Rxn model tests: the JAX-native pretrain->rxn encoder loader must be
exactly equivalent to the torch-state-dict path (export -> key surgery ->
convert), i.e. the two implementations of the reference's prefix-strip
strict=False load (SPMM_models_rxn.py:16-29) agree leaf-for-leaf."""

import numpy as np

import jax
import jax.numpy as jnp

from spmm_tpu.checkpoint.export import export_spmm_state_dict
from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models.rxn import (
    init_rxn_params, load_encoder_from_pretrain,
    load_encoder_from_pretrain_tree, rxn_loss,
)
from spmm_tpu.models.spmm import init_spmm_params

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
TEXT_CFG = BertArchConfig(**TINY, add_cross_attention=True)
PROP_CFG = BertArchConfig(**{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
                          add_cross_attention=False)
# rxn encoder: first fusion_layer layers of the text stack, no cross-attn
# (the tiny analogue of the reference 6-of-12 split)
ENC_CFG = BertArchConfig(**{**TINY, "num_hidden_layers": 2, "fusion_layer": 2},
                         add_cross_attention=False)


def test_tree_loader_matches_torch_state_path():
    pretrain = init_spmm_params(jax.random.PRNGKey(0), text_cfg=TEXT_CFG,
                                prop_cfg=PROP_CFG, embed_dim=16,
                                with_pretrain_heads=True)
    params = init_rxn_params(jax.random.PRNGKey(1), decoder_cfg=TEXT_CFG,
                             encoder_cfg=ENC_CFG)

    state = export_spmm_state_dict(pretrain, TEXT_CFG, PROP_CFG)
    via_torch = load_encoder_from_pretrain(params, state, ENC_CFG)
    via_tree = load_encoder_from_pretrain_tree(params, pretrain, ENC_CFG)

    flat_a, tree_a = jax.tree.flatten_with_path(via_torch)
    flat_b, tree_b = jax.tree.flatten_with_path(via_tree)
    assert tree_a == tree_b
    for (path, leaf_a), (_, leaf_b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(leaf_a, np.float32),
                                      np.asarray(leaf_b, np.float32),
                                      err_msg=str(path))
    # decoder untouched by the load
    np.testing.assert_array_equal(
        np.asarray(via_tree["decoder"]["bert"]["embeddings"]["word"]),
        np.asarray(params["decoder"]["bert"]["embeddings"]["word"]))


def test_cli_checkpoint_routing(tmp_path):
    """The rxn CLI's --checkpoint accepts an Orbax SPMM pretrain state (tree
    loader) and an Orbax rxn tree (resume) and routes each correctly."""
    from spmm_tpu.checkpoint.io import save_checkpoint
    from spmm_tpu.cli.rxn_prediction import load_rxn_checkpoint

    pretrain = init_spmm_params(jax.random.PRNGKey(0), text_cfg=TEXT_CFG,
                                prop_cfg=PROP_CFG, embed_dim=16,
                                with_pretrain_heads=True)
    params = init_rxn_params(jax.random.PRNGKey(1), decoder_cfg=TEXT_CFG,
                             encoder_cfg=ENC_CFG)

    # SPMM pretrain state (as cli.pretrain saves it: params nested in state)
    p1 = str(tmp_path / "pretrain_state")
    save_checkpoint(p1, {"params": pretrain, "step": np.int32(7)})
    loaded = load_rxn_checkpoint(params, p1, ENC_CFG)
    np.testing.assert_array_equal(
        np.asarray(loaded["smiles_encoder"]["bert"]["embeddings"]["word"]),
        np.asarray(pretrain["text_encoder"]["bert"]["embeddings"]["word"]))

    # rxn fine-tune resume tree (as the CLI's best-val save writes it)
    p2 = str(tmp_path / "rxn_best")
    save_checkpoint(p2, {"params": loaded})
    resumed = load_rxn_checkpoint(params, p2, ENC_CFG)
    np.testing.assert_array_equal(
        np.asarray(resumed["decoder"]["bert"]["embeddings"]["word"]),
        np.asarray(loaded["decoder"]["bert"]["embeddings"]["word"]))


def test_rxn_loss_finite_after_tree_load():
    pretrain = init_spmm_params(jax.random.PRNGKey(0), text_cfg=TEXT_CFG,
                                prop_cfg=PROP_CFG, embed_dim=16,
                                with_pretrain_heads=True)
    params = load_encoder_from_pretrain_tree(
        init_rxn_params(jax.random.PRNGKey(1), decoder_cfg=TEXT_CFG,
                        encoder_cfg=ENC_CFG),
        pretrain, ENC_CFG)
    k = jax.random.PRNGKey(2)
    src = jax.random.randint(k, (2, 12), 4, 300).at[:, 0].set(2)
    tgt = jax.random.randint(k, (2, 10), 4, 300).at[:, 0].set(2)
    loss = rxn_loss(params, TEXT_CFG, ENC_CFG,
                    src, jnp.ones((2, 12), jnp.int32),
                    tgt, jnp.ones((2, 10), jnp.int32))
    assert np.isfinite(float(loss))
