"""Import helper for the reference implementation (golden-parity tests only).

The reference pins transformers 4.30; under the installed 4.57 a few symbols
moved from transformers.modeling_utils to transformers.pytorch_utils — shim
them before importing reference modules.  Nothing from the reference is used
at runtime by spmm_tpu; these imports exist purely so tests can compare
numerics against the reference's torch graph on random weights.
"""

import sys

REFERENCE_DIR = "/root/reference"


def import_reference_xbert():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import transformers.modeling_utils as mu
    from transformers.pytorch_utils import (
        apply_chunking_to_forward,
        find_pruneable_heads_and_indices,
        prune_linear_layer,
    )

    mu.apply_chunking_to_forward = apply_chunking_to_forward
    mu.find_pruneable_heads_and_indices = find_pruneable_heads_and_indices
    mu.prune_linear_layer = prune_linear_layer
    import xbert

    return xbert


def torch_state_to_numpy(module):
    import torch

    return {
        k: v.detach().to(torch.float32).numpy()
        for k, v in module.state_dict().items()
    }
