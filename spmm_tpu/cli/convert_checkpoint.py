"""Convert a reference PyTorch SPMM checkpoint to a native Orbax checkpoint.

Applies the reference's load-time key surgery as explicit converter rules
(SURVEY §2.4) and validates the tree structurally before saving.

    python -m spmm_tpu.cli.convert_checkpoint \
        --torch_ckpt checkpoint_SPMM.ckpt --out ./ckpt_spmm
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--with_momentum", action="store_true",
                   help="also convert the momentum twins (pretrain resume)")
    p.add_argument("--no_pretrain_heads", action="store_true",
                   help="drop proj/itm heads (inference-only checkpoint)")
    args = p.parse_args(argv)

    from spmm_tpu.checkpoint.convert import load_torch_state_dict
    from spmm_tpu.checkpoint.io import save_checkpoint
    from spmm_tpu.models.spmm import convert_spmm_checkpoint

    state = load_torch_state_dict(args.torch_ckpt)
    params = convert_spmm_checkpoint(
        state,
        with_pretrain_heads=not args.no_pretrain_heads,
        with_momentum=args.with_momentum,
    )
    params = jax.tree.map(jnp.asarray, params)
    n = sum(x.size for x in jax.tree.leaves(params))
    save_checkpoint(args.out, params)
    print(f"converted {n:,} parameters -> {args.out}")


if __name__ == "__main__":
    main()
