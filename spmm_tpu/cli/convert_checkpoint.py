"""Convert a reference PyTorch SPMM checkpoint to a native Orbax checkpoint
— or export back the other way.

Applies the reference's load-time key surgery as explicit converter rules
(SURVEY §2.4) before saving.  Output modes:

  params (default) — inference/fine-tune params tree; loadable by every CLI
      via spmm_tpu.checkpoint.io.load_spmm_params.
  --as_pretrain_state — a RESUMABLE pretrain state (params + EMA from the
      momentum twins + queues/ptr from the checkpoint buffers + fresh
      optimizer state), loadable by ``python -m spmm_tpu.cli.pretrain
      --resume <out>``.
  --to_torch — the REVERSE direction: read a checkpoint (Orbax dir or
      torch .ckpt) and write a reference-loadable
      ``{"state_dict": ...}`` torch checkpoint (checkpoint/export.py),
      handing a spmm_tpu-trained model back to the reference code.

    python -m spmm_tpu.cli.convert_checkpoint \
        --torch_ckpt checkpoint_SPMM.ckpt --out ./ckpt_spmm
    python -m spmm_tpu.cli.convert_checkpoint \
        --torch_ckpt ./ckpt_spmm --out exported.ckpt --to_torch
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--as_pretrain_state", action="store_true",
                   help="emit a resumable pretrain state (EMA + queues + "
                        "fresh optimizer) instead of a bare params tree")
    p.add_argument("--no_pretrain_heads", action="store_true",
                   help="drop proj/itm heads (inference-only checkpoint)")
    p.add_argument("--queue_size", type=int, default=36864)
    p.add_argument("--verify", default=None, metavar="SMILES_FILE",
                   help="golden gate: run SMILES->PV through BOTH the "
                        "reference torch graph and the converted JAX params "
                        "on these molecules and assert agreement "
                        "(BASELINE.json north star; needs /root/reference "
                        "+ torch)")
    p.add_argument("--verify_tolerance", type=float, default=1e-4)
    p.add_argument("--to_torch", action="store_true",
                   help="reverse direction: load the checkpoint (Orbax or "
                        "torch) and write a reference-loadable torch "
                        ".ckpt to --out")
    args = p.parse_args(argv)

    from spmm_tpu.checkpoint.io import load_spmm_params, save_checkpoint
    from spmm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.to_torch:
        from spmm_tpu.checkpoint.export import save_torch_checkpoint

        params = load_spmm_params(
            args.torch_ckpt,
            with_pretrain_heads=not args.no_pretrain_heads)
        save_torch_checkpoint(args.out, params)
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f"exported {n:,} parameters -> {args.out} (torch state_dict)")
        return

    if args.as_pretrain_state:
        from spmm_tpu.checkpoint.convert import load_torch_state_dict
        from spmm_tpu.configs import PretrainConfig
        from spmm_tpu.training.pretrain import pretrain_state_from_reference

        state_dict = load_torch_state_dict(args.torch_ckpt)
        out_tree = pretrain_state_from_reference(
            state_dict, PretrainConfig(queue_size=args.queue_size))
    else:
        out_tree = load_spmm_params(
            args.torch_ckpt,
            with_pretrain_heads=not args.no_pretrain_heads)

    n = sum(x.size for x in jax.tree.leaves(out_tree))
    save_checkpoint(args.out, out_tree)
    print(f"converted {n:,} parameters -> {args.out}")

    if args.verify:
        from spmm_tpu.checkpoint.verify import verify_checkpoint

        with open(args.verify) as f:
            smiles = [ln.strip() for ln in f if ln.strip()]
        dev = verify_checkpoint(args.torch_ckpt, smiles,
                                tolerance=args.verify_tolerance)
        print(f"verification OK: max |deviation| {dev:.2e} over "
              f"{len(smiles)} molecules x 53 properties "
              f"(tolerance {args.verify_tolerance:.0e})")


if __name__ == "__main__":
    main()
