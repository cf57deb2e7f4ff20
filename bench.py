"""Headline benchmark: PV->SMILES k=2 beam-decode throughput (molecules/sec).

Structure (r4, after BENCH_r03's rc=124): the parent process never touches
JAX — every device workload runs in its own subprocess worker so the one
chip is free for each in turn, a SIGKILLed compile cannot take down the
harness, and a failing child's stderr tail is captured and printed.  A
single global wall-clock budget (SPMM_BENCH_BUDGET_S, default 1500 s)
governs everything; each JSON line prints the moment it lands, most
important first, so a driver kill loses only the tail:

  1. PENDING notes for the two env-blocked golden gates;
  2. the HEADLINE pv2smiles_beam_k2_throughput line (printed immediately,
     and printed AGAIN as the final line so "last JSON line" parsers see it);
     an implausibly slow reading (< DECODE_SANE_FLOOR — the chip is shared
     and contention has produced a 17x spread on identical workloads) earns
     a retry, keeping the best;
  3. pv2smiles_beam_k2_throughput_100step: the decode at the reference's
     REAL length cap (reference d_pv2smiles_single.py:86 caps at 100 token
     steps; the headline 60-step number is length-controlled against the
     cached torch baseline, which was measured at 60 steps); both decode
     lengths run in ONE --decode-suite worker so startup is paid once and a
     timeout keeps already-flushed lines;
  4. host_pipeline_samples_per_sec (also via --pipeline-only, no TPU):
    tokenizer+batching host throughput, which must exceed 8x the single-chip
    pretrain step rate to keep a v5e-8 fed (the reference tokenizes inside
    the train step — SPMM_models.py:353 — the anti-pattern replaced here);
  5. smiles2pv_mol_per_sec + rxn_greedy_mol_per_sec: the two remaining
     reference decode surfaces (d_smiles2pv.py:29-75,
     d_rxn_prediction.py:55-81), budget-gated, vs the torch-CPU
     reference-strategy baselines (cached in bench_baseline.json);
  6. pretrain_samples_per_sec_chip (with "mfu"): full-size pretrain step
     ladder, LAST, bounded by the remaining budget (in r3 this ladder ran
     first, failed two rungs at ~10 min of compile each, and starved the
     headline out of the driver window).  After the ladder, leftover budget
     buys the best-MFU rung (batch 32, the r2 0.555 record config) and the
     reference-batch-96-via-accumulation rung, then a "pretrain_mfu" line
     reports the best plausible utilization witnessed — throughput and MFU
     are different optima and the ladder's early break must not starve the
     second (VERDICT r4).

Every timed decode iteration perturbs its inputs: the axon runtime serves
cached results for repeated identical inputs (NOTES.md), so timing the same
arrays twice reads ~0 ms and lies.

PENDING lines flag the two env-blocked validation gates (released-checkpoint
golden parity, RDKit featurizer goldens) so the round either runs them or
loudly records why not.

The workload is the reference's primary perf surface (SURVEY §3.3 /
BASELINE.md): batched PV->SMILES deterministic k=2 beam decode.  Both sides
decode the SAME random-weight model for a fixed number of token steps (no
early termination):

  - spmm_tpu: on-device batched beam search with KV cache (one chip);
  - baseline: the reference's decode strategy — full-prefix re-forward per
    token with host-side beam bookkeeping, PyTorch CPU (xbert oracle).  The
    measured baseline is cached in bench_baseline.json so the bench also runs
    where /root/reference or torch is unavailable.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")

N_MOLECULES = 1024   # per-molecule rate is count-invariant; 1024 gives the
#                      batch-512 rung two timed batches (one cumulative
#                      partial flush = stall insurance)
# r5 late-session sweep: 863.9/870.8 mol/s @512 (two independent runs) vs
# 666.3 @256 — the DMA-bound kernel amortizes ~30% better at 512.  The
# ladder falls back when the shared chip's free HBM is short.  COLD-CACHE
# CAVEAT: the batch-512 compile took >25 min on the remote helper (the 256
# one ~7 min); on a cold machine the suite worker's cap starves it and the
# headline lands via the 256/128 retry attempts instead — keep .jax_cache
# prewarmed (CLAUDE.md).
DEVICE_BATCHES = (512, 256, 128)
MAX_STEPS = 60
K = 2

FULL_STEPS = 100   # the reference's actual decode cap
# r5 late sweep at 100 steps: 489.9/486.2 mol/s @512 (quiet chip, two
# runs; an adjacent contended run read 88.6 — same workload) vs r3's
# 468.6 @256, 459.5 @128, 355.5 @64
FULL_STEPS_BATCHES = (512, 256, 128)

# A 60-step headline below this is treated as a contention artifact, not a
# regression, and earns a retry: the shared chip has produced 47.3 and 792.4
# mol/s for the IDENTICAL workload minutes apart (r4), and the slowest
# honest number ever recorded is r2's 502 (XLA path, driver-witnessed).
DECODE_SANE_FLOOR = 300.0

PRETRAIN_BATCH = 64
PRETRAIN_TIMEOUT_S = 1500

RELEASED_CKPT_CANDIDATES = (
    "./checkpoint_SPMM.ckpt",
    "/root/checkpoint_SPMM.ckpt",
    "/root/repo/checkpoint_SPMM.ckpt",
)


def bench_spmm_tpu_laddered(max_steps: int = MAX_STEPS,
                            device_batches=DEVICE_BATCHES,
                            n_molecules: int = N_MOLECULES,
                            emit=None) -> float:
    """Try device batches largest-first; an OOM (RESOURCE_EXHAUSTED on the
    shared chip when free HBM is low) falls through to the next rung."""
    last_err = None
    for db in device_batches:
        try:
            return bench_spmm_tpu(max_steps, db, n_molecules, emit=emit)
        except Exception as e:
            print(f"decode bench at batch {db}: {type(e).__name__}",
                  file=sys.stderr)
            last_err = e
    raise last_err


def bench_spmm_tpu(max_steps: int = MAX_STEPS,
                   device_batch: int = 256,
                   n_molecules: int = N_MOLECULES,
                   emit=None) -> float:
    """`emit(v)` (optional) is called with the cumulative throughput after
    each completed timed batch EXCEPT the last: on the shared chip a single
    dispatch has stalled >10 min mid-timing-loop (r4 prewarm: the 900 s
    decode-suite worker died with the compile done and zero output), and a
    partial line over the batches that DID complete — each with a hard host
    data dependency — is an honest reading the parent's partial-output
    parser can keep."""
    import jax
    from spmm_tpu.inference.decoding import BeamSpec
    from spmm_tpu.inference.pv2smiles import _beam_batch
    from spmm_tpu.models.spmm import init_spmm_params

    print(f"decode bench: batch {device_batch}, {max_steps} steps — "
          "compiling", file=sys.stderr, flush=True)
    params = init_spmm_params(jax.random.PRNGKey(0), with_pretrain_heads=False)
    # stop_count is unreachable: both sides decode the full max_steps tokens
    spec = BeamSpec(k=K, stop_count=K * K * max_steps, stochastic=False,
                    max_steps=max_steps)

    def inputs(i: int):
        # fresh pv/rngs per timed call: identical inputs are served from the
        # axon runtime's result cache and time ~0 ms (NOTES.md)
        key = jax.random.fold_in(jax.random.PRNGKey(2), i)
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (device_batch, 53)),
                jax.random.split(k2, device_batch))

    pv, rngs = inputs(0)
    out = _beam_batch(params, pv, None, rngs, spec)   # warmup / compile
    jax.block_until_ready(out)
    print(f"decode bench: batch {device_batch} compiled — timing",
          file=sys.stderr, flush=True)

    n_batches = max(n_molecules // device_batch, 1)
    batches = [inputs(i + 1) for i in range(n_batches)]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    sums = []
    for i, (pv, rngs) in enumerate(batches):
        out = _beam_batch(params, pv, None, rngs, spec)
        # hard host data dependency per iteration: the axon runtime's
        # block_until_ready intermittently returns early (observed r3:
        # impossible 3.4 "MFU" timings); fetching a reduction of the
        # result cannot lie
        sums.append(int(jax.device_get(out["lengths"].sum())))
        # sums[-1] > 0 is the same validity gate as the post-loop assert: a
        # flushed partial must never include a zero-length (broken) batch —
        # the laddered wrapper swallows the AssertionError, and the parent
        # would keep the invalid partial via max() (ADVICE r4)
        if emit is not None and i + 1 < n_batches and sums[-1] > 0:
            emit((i + 1) * device_batch / (time.perf_counter() - t0))
    dt = time.perf_counter() - t0
    assert all(s > 0 for s in sums)
    return n_batches * device_batch / dt


def bench_torch_cpu_baseline(max_steps: int = MAX_STEPS) -> float:
    """Reference decode strategy on torch CPU (xbert oracle)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from reference_shim import import_reference_xbert

    ref = import_reference_xbert()
    import torch

    torch.manual_seed(0)
    tcfg = ref.BertConfig.from_json_file("/root/reference/config_bert.json")
    model = ref.BertForMaskedLM(config=tcfg).eval()
    prop_embeds = torch.randn(1, 54, 768)

    def gen(product_input):
        atts = torch.where(product_input == 0, 0, 1)
        n = product_input.size(0)
        with torch.no_grad():
            logits = model(product_input, attention_mask=atts,
                           encoder_hidden_states=prop_embeds.expand(n, -1, -1),
                           encoder_attention_mask=torch.ones(n, 54,
                                                             dtype=torch.long),
                           return_dict=True, is_decoder=True,
                           return_logits=True)[:, -1, :]
        p = torch.softmax(logits, dim=-1)
        out = torch.topk(p, k=K, dim=-1)
        return torch.log(out.values), out.indices

    import numpy as np

    def decode_one():
        # reference d_pv2smiles_batched.py:29-49 (no early stop: fixed steps)
        product_input = torch.tensor([[2]])
        values, indices = gen(product_input)
        product_input = torch.cat(
            [torch.full((K, 1), 2), indices.squeeze(0).unsqueeze(-1)], dim=-1)
        current_p = values.squeeze(0)
        for _ in range(max_steps):
            values, indices = gen(product_input)
            k2_p = current_p[:, None] + values
            product_input_k2 = torch.cat(
                [product_input.unsqueeze(1).repeat(1, K, 1),
                 indices.unsqueeze(-1)], dim=-1)
            current_p, i = torch.topk(k2_p.flatten(), K)
            nxt = np.array(np.unravel_index(i.numpy(), tuple(k2_p.shape))).T
            product_input = torch.stack(
                [product_input_k2[a, b] for a, b in nxt], dim=0)

    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        decode_one()
    dt = time.perf_counter() - t0
    return n / dt


def bench_pipeline() -> dict:
    """Host-pipeline throughput: tokenize+bucket-pad+batch, no device.

    A v5e-8 consumes 8x the single-chip pretrain step rate; the host pipeline
    (native wordpiece tokenizer + property cache reads + numpy batching) must
    sustain more than that or the chips starve.  Synthetic-but-realistic
    SMILES corpus; property lookup simulated by a cached [N, 53] array, the
    production path (PretrainDataset property_cache).
    """
    import numpy as np
    from spmm_tpu.data.pipeline import batch_pretrain, prefetch
    from spmm_tpu.tokenizer import SmilesTokenizer

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "examples", "s2p_input.txt")) as f:
        seeds = [l.strip() for l in f if l.strip()]
    rng = np.random.default_rng(0)
    frags = ["C", "CC", "c1ccccc1", "C(=O)O", "N", "Cl", "CCO", "C1CCCCC1"]
    corpus = []
    for i in range(50_000):
        s = seeds[i % len(seeds)]
        corpus.append(s + "".join(rng.choice(frags)
                                  for _ in range(int(rng.integers(0, 3)))))

    class _DS:  # the PretrainDataset fast path: cached PV + raw text
        pv = rng.normal(size=(len(corpus), 53)).astype(np.float32)

        def __len__(self):
            return len(corpus)

        def __getitem__(self, i):
            return self.pv[i], "[CLS]" + corpus[i]

    tok = SmilesTokenizer()
    bs = 96
    n = 0
    it = prefetch(batch_pretrain(tok, _DS(), bs, shuffle=True), depth=4)
    t0 = time.perf_counter()
    for b in it:
        n += b["ids"].shape[0]
    dt = time.perf_counter() - t0
    return {
        "metric": "host_pipeline_samples_per_sec",
        "value": round(n / dt, 1),
        "unit": "samples/s",
        "vs_baseline": None,
        "native_tokenizer": tok._native is not None,
    }


def bench_smiles2pv_line() -> dict:
    """SMILES->PV throughput on the chip (reference d_smiles2pv.py:29-75
    workload: 53-step autoregressive property decode).  One JSON line."""
    import jax
    import jax.numpy as jnp
    from spmm_tpu.inference.smiles2pv import predict_pv
    from spmm_tpu.models.spmm import init_spmm_params

    seq_len = 48
    params = init_spmm_params(jax.random.PRNGKey(0), with_pretrain_heads=False)

    def inputs(i, batch):
        key = jax.random.fold_in(jax.random.PRNGKey(2), i)
        return (jax.random.randint(key, (batch, seq_len), 4, 300),
                jnp.ones((batch, seq_len), jnp.int32))

    last_err = None
    for batch in (128, 64):   # r3 sweep: 221.8 mol/s @128, 169.6 @64 (fp32)
        try:
            print(f"smiles2pv bench: batch {batch} — compiling",
                  file=sys.stderr, flush=True)
            out = predict_pv(params, *inputs(0, batch))
            jax.block_until_ready(out)
            n_iter = 5
            batches = [inputs(i + 1, batch) for i in range(n_iter)]
            jax.block_until_ready(batches)
            t0 = time.perf_counter()
            for b in batches:
                out = predict_pv(params, *b)
                # hard host data dependency (axon block_until_ready lies)
                float(jax.device_get(jnp.abs(out).sum()))
            dt = time.perf_counter() - t0
            value = n_iter * batch / dt
            return {"metric": "smiles2pv_mol_per_sec",
                    "value": round(value, 1), "unit": "mol/s",
                    "vs_baseline": None, "batch": batch, "seq_len": seq_len}
        except Exception as e:
            print(f"smiles2pv bench at batch {batch}: {type(e).__name__}",
                  file=sys.stderr)
            last_err = e
    raise last_err


def bench_rxn_greedy_line() -> dict:
    """Reaction-prediction greedy decode throughput on the chip (reference
    d_rxn_prediction.py:55-81 workload: whole-set batched greedy, cap 100).
    One JSON line."""
    import jax
    import jax.numpy as jnp
    from spmm_tpu.inference.rxn import _greedy_batch
    from spmm_tpu.models.rxn import init_rxn_params

    src_len, max_steps = 96, FULL_STEPS
    params = init_rxn_params(jax.random.PRNGKey(0))

    def inputs(i, batch):
        key = jax.random.fold_in(jax.random.PRNGKey(2), i)
        ids = jax.random.randint(key, (batch, src_len), 4, 300).at[:, 0].set(2)
        return ids, jnp.ones((batch, src_len), jnp.int32)

    last_err = None
    for batch in (128, 64):   # r3 sweep: 413.9 mol/s @128
        try:
            print(f"rxn greedy bench: batch {batch} — compiling",
                  file=sys.stderr, flush=True)
            out = _greedy_batch(params, *inputs(0, batch),
                                max_steps=max_steps)
            jax.block_until_ready(out)
            n_iter = 3
            batches = [inputs(i + 1, batch) for i in range(n_iter)]
            jax.block_until_ready(batches)
            t0 = time.perf_counter()
            for b in batches:
                out = _greedy_batch(params, *b, max_steps=max_steps)
                # hard host data dependency (axon block_until_ready lies)
                int(jax.device_get(out["seqs"].sum()))
            dt = time.perf_counter() - t0
            value = n_iter * batch / dt
            return {"metric": "rxn_greedy_mol_per_sec",
                    "value": round(value, 1), "unit": "mol/s",
                    "vs_baseline": None, "batch": batch,
                    "src_len": src_len, "max_steps": max_steps}
        except Exception as e:
            print(f"rxn greedy bench at batch {batch}: {type(e).__name__}",
                  file=sys.stderr)
            last_err = e
    raise last_err


def bench_torch_smiles2pv_baseline() -> float:
    """Reference smiles2pv strategy on torch CPU (d_smiles2pv.py:14-26):
    53 full (property-encoder + fusion-decoder) re-forwards of the growing
    property prefix per batch; mol/s."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from reference_shim import import_reference_xbert

    ref = import_reference_xbert()
    import torch

    torch.manual_seed(0)
    text = ref.BertForMaskedLM(
        config=ref.BertConfig.from_json_file(
            "/root/reference/config_bert.json")).eval()
    prop = ref.BertModel(
        config=ref.BertConfig.from_json_file(
            "/root/reference/config_bert_property.json"),
        add_pooling_layer=False).eval()
    embed = torch.nn.Linear(1, 768)
    head = torch.nn.Linear(768, 1)

    batch, seq_len = 4, 48
    ids = torch.randint(4, 300, (batch, seq_len))
    mask = torch.ones(batch, seq_len, dtype=torch.long)
    with torch.no_grad():
        text_embeds = text.bert(ids, attention_mask=mask, return_dict=True,
                                mode="text").last_hidden_state
        t0 = time.perf_counter()
        prop_in = torch.zeros(batch, 1, 768)
        for _ in range(53):   # d_smiles2pv.py:66-70
            n = prop_in.size(1)
            out = prop(inputs_embeds=prop_in,
                       return_dict=True).last_hidden_state
            out = text.bert(encoder_embeds=out,
                            attention_mask=torch.ones(batch, n,
                                                      dtype=torch.long),
                            encoder_hidden_states=text_embeds,
                            encoder_attention_mask=mask,
                            return_dict=True, is_decoder=True,
                            mode="fusion").last_hidden_state
            pred = head(out[:, -1, :])
            prop_in = torch.cat([prop_in, embed(pred).unsqueeze(1)], dim=1)
        dt = time.perf_counter() - t0
    return batch / dt


def bench_torch_rxn_greedy_baseline() -> float:
    """Reference rxn greedy strategy on torch CPU (d_rxn_prediction.py:55-81):
    full-prefix decoder re-forward per token, batched, cap 100; mol/s."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    from reference_shim import import_reference_xbert

    ref = import_reference_xbert()
    import torch

    torch.manual_seed(0)
    dec = ref.BertForMaskedLM(
        config=ref.BertConfig.from_json_file(
            "/root/reference/config_bert.json")).eval()
    enc = ref.BertForMaskedLM(
        config=ref.BertConfig.from_json_file(
            "/root/reference/config_bert_smiles.json")).eval()

    batch, src_len = 4, 96
    src = torch.randint(4, 300, (batch, src_len))
    src[:, 0] = 2
    src_mask = torch.ones(batch, src_len, dtype=torch.long)
    with torch.no_grad():
        hidden = enc.bert(src, attention_mask=src_mask, return_dict=True,
                          mode="text").last_hidden_state
        t0 = time.perf_counter()
        product = torch.full((batch, 1), 2)
        for _ in range(FULL_STEPS):   # d_rxn_prediction.py:62-76
            logits = dec(product,
                         attention_mask=torch.ones_like(product),
                         encoder_hidden_states=hidden,
                         encoder_attention_mask=src_mask,
                         return_dict=True, is_decoder=True,
                         return_logits=True)[:, -1, :]
            nxt = logits.argmax(dim=-1, keepdim=True)
            product = torch.cat([product, nxt], dim=-1)
        dt = time.perf_counter() - t0
    return batch / dt


def _device_step_ms(compiled, state, rng, make_batch, n_steps: int = 4):
    """Median on-device duration (ms) of the compiled train step, read from
    a jax.profiler trace: the sum of XLA-module event durations on the TPU
    process track divided by the step count.  Works on the axon runtime
    (verified r5: the rbg/deterministic A/B probes used exactly this)."""
    import glob
    import gzip
    import shutil
    import tempfile

    import jax

    tdir = tempfile.mkdtemp(prefix="spmm_devtrace_")
    try:
        jax.profiler.start_trace(tdir)
        metrics = None
        for i in range(n_steps):
            # fresh inputs per step: the axon runtime serves cached results
            # for repeated identical inputs (NOTES.md r3)
            state, metrics = compiled(state, make_batch(70_000 + i),
                                      jax.random.fold_in(rng, 70_000 + i))
        float(metrics["loss"])   # hard data dependency on the whole window
        jax.profiler.stop_trace()
        total_us = 0.0
        for path in glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True):
            with gzip.open(path) as f:
                tr = json.load(f)
            ev = tr.get("traceEvents", [])
            pids = {e["pid"]: e["args"].get("name", "") for e in ev
                    if e.get("ph") == "M" and e.get("name") == "process_name"}
            total_us += sum(
                e.get("dur", 0) for e in ev
                if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], "")
                and e["name"].startswith("jit_train_step"))
        if total_us <= 0:
            return None
        return round(total_us / 1e3 / n_steps, 1)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


def bench_pretrain() -> dict:
    """Full-size data-parallel pretrain step on one chip: samples/s + MFU.

    Matches the reference pretrain step (SPMM_models.py:348-380) at per-chip
    batch PRETRAIN_BATCH.  MFU uses XLA's compiled cost analysis when
    available (fwd+bwd flops of the whole four-objective step) against the
    v5e bf16 peak.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from spmm_tpu.configs import PretrainConfig, property_config, text_config
    from spmm_tpu.parallel.mesh import data_parallel_mesh
    from spmm_tpu.training.pretrain import (
        init_pretrain_state, make_pretrain_step,
    )

    from spmm_tpu.utils.prng import set_default_prng
    from spmm_tpu.utils.profiling import compiled_flops, mfu

    # rbg (TPU-native RngBitGenerator) dropout/masking: measured 207.5 ->
    # 151.6 ms/step at batch 32 vs threefry (-27%, r5 device trace; dropout
    # fully off reads 131.8).  Same training distribution — the reference's
    # cuDNN dropout stream is a third stream again (utils/prng.py).
    prng_impl = os.environ.get("SPMM_PRETRAIN_PRNG", "rbg")
    set_default_prng(prng_impl)

    def run_at_batch(bs, accum=1):
        # bf16 compute + bf16 Adam mu mirror the reference's fp16-AMP
        # precision envelope.  remat is env-switchable: donation halved the
        # state HBM, so batch 64 can fit WITHOUT remat — recompute-free
        # backward = fewer executed flops per sample = higher samples/s
        # (the reported "mfu" uses XLA's executed-flop count, so remat
        # inflates it; samples/s is the honest comparison).
        remat = os.environ.get("SPMM_PRETRAIN_REMAT", "1") == "1"
        pcfg = PretrainConfig(batch_size=bs, bf16_compute=True, remat=remat,
                              bf16_moments=True)
        text_cfg, prop_cfg = text_config(), property_config()
        mesh = data_parallel_mesh(1)
        # jit the whole init: eager init dispatches thousands of tiny ops,
        # each a remote round-trip on axon (measured ~7 min of setup)
        state = jax.jit(init_pretrain_state,
                        static_argnums=(1, 2, 3))(
            jax.random.PRNGKey(0), pcfg, text_cfg, prop_cfg)
        from jax.sharding import NamedSharding, PartitionSpec
        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        # donate=True: the axon runtime pays a ~0.4 s remote round-trip per
        # NEWLY allocated output buffer, so a non-donating step returning the
        # ~700-leaf state stalls ~280 s on each of its first two dispatches
        # (two buffer generations before the pool recycles).  Donation
        # aliases outputs onto the input buffers — zero new allocations,
        # storms gone — and halves peak state HBM.  (The r2-era
        # INVALID_ARGUMENT donation failure on axon is fixed runtime-side:
        # re-verified on the full-size step this round.)
        step_fn = make_pretrain_step(mesh, pcfg, steps_per_epoch=1000,
                                     text_cfg=text_cfg, prop_cfg=prop_cfg,
                                     accum=accum, donate=True)
        rng = jax.random.PRNGKey(1)

        def make_batch(i):
            # fresh ids/prop per step (axon result cache, see bench_spmm_tpu)
            k1, k2 = jax.random.split(jax.random.fold_in(rng, 1000 + i))
            ids = jax.random.randint(k1, (bs, 100), 4, 300).at[:, 0].set(2)
            return {"prop": jax.random.normal(k2, (bs, 53)), "ids": ids,
                    "mask": jnp.ones((bs, 100), jnp.int32)}

        # one executable for both the run and the flops estimate (a second
        # lower().compile() alongside the jit cache OOMs the chip)
        batch = make_batch(0)
        print(f"pretrain bench: batch {bs} accum {accum} — compiling",
              file=sys.stderr, flush=True)
        compiled = step_fn.lower(state, batch, rng).compile()
        print(f"pretrain bench: batch {bs} compiled — timing",
              file=sys.stderr, flush=True)
        flops_per_step = compiled_flops(compiled)
        # TWO warmup steps: with donation the allocation storms are gone and
        # these cost ~0.5 s total, but they stay as insurance — if donation
        # ever silently degrades to copying again, the storms land here
        # instead of inside the timed window (and the median below shields
        # the reading either way).
        for w in range(2):
            state, metrics = compiled(state, batch,
                                      jax.random.fold_in(rng, 90_000 + w))
            float(metrics["loss"])
        # Timing: PIPELINED windows.  Fetching the loss inside the timed
        # region serializes a full tunnel round-trip into every step (the
        # chip is remote): measured r4, per-step-fetch timing reads a
        # rock-stable 131 samples/s @64 regardless of remat/contention,
        # because each "step" is really step + RTT.  Instead, dispatch a
        # whole window back-to-back and fetch ONE datum of the LAST step:
        # state chains step-to-step (state_i consumes state_{i-1}), so that
        # single fetch is a hard data dependency on the entire window —
        # block_until_ready's intermittent early-return (r3: impossible
        # 3.4 "MFU") cannot lie here, and the RTT is paid once per window,
        # exactly like a production train loop that doesn't sync per step.
        # Two windows, best-window mean: an 18 s contention burst
        # (observed r3) poisons at most one window; the window is wide so
        # the one unavoidable end-of-window fetch RTT amortizes to noise.
        # THREE windows: contention bursts (18 s dispatch stalls observed
        # r3) poison whole windows, and the per-window spread is itself the
        # contention evidence the record carries (step_ms_windows below) —
        # wall clock alone can't distinguish "slow chip" from "slow session"
        n_windows, window = 3, 12
        batches = [make_batch(i + 1) for i in range(n_windows * window)]
        jax.block_until_ready(batches)
        all_metrics, per_window = [], []
        for w in range(n_windows):
            t0 = time.perf_counter()
            for i in range(w * window, (w + 1) * window):
                state, metrics = compiled(state, batches[i],
                                          jax.random.fold_in(rng, i))
                all_metrics.append(metrics)
            float(all_metrics[-1]["loss"])   # forces the whole window
            per_window.append((time.perf_counter() - t0) / window)
            # cumulative partial line after every completed window: an r5
            # drive lost the whole pretrain reading to a >15-min dispatch
            # stall AFTER the (cached) executable loaded — a flushed
            # best-window-so-far partial keeps what the chip already proved
            # (the parent prefers the final rec when one lands)
            dt_w = min(per_window)
            print(json.dumps({
                "metric": "pretrain_samples_per_sec_chip",
                "value": round(bs / dt_w, 2), "unit": "samples/s/chip",
                "vs_baseline": None,
                "mfu": round(mfu(flops_per_step, dt_w, n_chips=1), 4)
                if mfu(flops_per_step, dt_w, n_chips=1) else None,
                "batch": bs, "accum": accum,
                "step_ms_best": round(dt_w * 1000, 1),
                "step_ms_windows": [round(x * 1000, 1) for x in per_window],
                "partial": True,
            }), flush=True)
            print(f"pretrain bench: window {w + 1}/{n_windows} "
                  f"({per_window[-1] * 1000:.1f} ms/step)",
                  file=sys.stderr, flush=True)
        dt = min(per_window)
        # finite check on EVERY step's loss, fetched outside the clock
        losses = [float(m["loss"]) for m in all_metrics]
        assert all(np.isfinite(l) for l in losses)
        # ON-DEVICE step time (VERDICT r4 item 1): a profiler-traced window
        # reads the XLA module's device duration directly — host contention
        # and tunnel RTTs cannot touch it, so a good chip reading survives a
        # bad session.  Best-effort: any profiler/parse failure just leaves
        # the field null (the wall-clock windows above remain the record).
        dev_ms = None
        if os.environ.get("SPMM_PRETRAIN_DEVICE_TRACE", "1") == "1":
            print(f"pretrain bench: batch {bs} timed "
                  f"({[round(w * 1000, 1) for w in per_window]} ms) — device "
                  "trace", file=sys.stderr, flush=True)
            try:
                dev_ms = _device_step_ms(compiled, state, rng, make_batch)
            except Exception as e:   # noqa: BLE001 — diagnostic only
                print(f"pretrain bench: device trace failed ({e!r}); "
                      "reporting wall clock only", file=sys.stderr)
        return dt, flops_per_step, per_window, dev_ms

    bs = int(os.environ.get("SPMM_PRETRAIN_BATCH", PRETRAIN_BATCH))
    accum = int(os.environ.get("SPMM_PRETRAIN_ACCUM", "1"))
    dt, flops_per_step, per_window, dev_ms = run_at_batch(bs, accum)
    util = mfu(flops_per_step, dt, n_chips=1)
    return {
        "metric": "pretrain_samples_per_sec_chip",
        "value": round(bs / dt, 2),
        "unit": "samples/s/chip",
        "vs_baseline": None,
        "mfu": round(util, 4) if util else None,
        "batch": bs,
        "accum": accum,
        "remat": os.environ.get("SPMM_PRETRAIN_REMAT", "1") == "1",
        "prng": prng_impl,
        # per-window wall-clock step time: the spread across windows is the
        # contention witness — a tight spread means the best-window reading
        # IS the chip's speed; a wide one means the session was contended
        "step_ms_best": round(dt * 1000, 1),
        "step_ms_windows": [round(w * 1000, 1) for w in per_window],
        # profiler-measured on-device module time per step (null when the
        # profiler is unavailable): the contention-immune reading
        "step_ms_device": dev_ms,
        "flops_per_step": flops_per_step,
    }


def pending_gates() -> list[str]:
    """Env-blocked validation gates: run them the moment the env allows,
    otherwise print a loud PENDING notice (VERDICT r2 item 7)."""
    notes = []
    ckpt = next((p for p in RELEASED_CKPT_CANDIDATES if os.path.exists(p)),
                None)
    if ckpt is None:
        notes.append(
            "PENDING: env-blocked gate — released checkpoint_SPMM.ckpt "
            "absent; when present run `python -m spmm_tpu.cli."
            "convert_checkpoint --checkpoint <ckpt> --verify "
            "examples/s2p_input.txt` (1e-4 golden parity, BASELINE.json "
            "north star; reference load path d_smiles2pv.py:119-143)")
    else:
        notes.append(f"RUN NOW: released checkpoint found at {ckpt} — "
                     "execute the convert_checkpoint --verify golden gate")
    try:
        import rdkit  # noqa: F401
        notes.append("RUN NOW: RDKit present — run the pinned-value "
                     "featurizer goldens (tests/test_chem.py)")
    except ImportError:
        notes.append(
            "PENDING: env-blocked gate — RDKit absent; featurizer goldens "
            "(reference calc_property.py:31-36, rdkit==2023.3.1) have never "
            "executed in this image")
    return notes


def _load_baseline(key: str, max_steps: int):
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if cache.get("k", K) != K:
        # cached numbers were measured at a different beam width: the
        # vs_baseline ratio would silently compare unlike workloads
        print(f"baseline cache k={cache.get('k')} != current K={K}; "
              "re-measuring", file=sys.stderr)
        cache = {}
    if key in cache:
        return cache[key]
    try:
        if key == "torch_cpu_smiles2pv":
            value = bench_torch_smiles2pv_baseline()
        elif key == "torch_cpu_rxn_greedy":
            value = bench_torch_rxn_greedy_baseline()
        else:
            value = bench_torch_cpu_baseline(max_steps)
    except Exception as e:  # reference/torch unavailable
        print(f"baseline measurement unavailable: {e}", file=sys.stderr)
        return None
    cache[key] = value
    cache["k"] = K
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f)
    return value


def _run_worker(args_list, timeout_s, env_extra=None, want_err=False):
    """Run one bench worker subprocess; return every stdout JSON line parsed
    (a killed worker's already-flushed lines still count — a timeout mid-
    compile of a LATER sub-bench must not discard an earlier result).  The
    parent never initializes JAX — the machine has ONE chip, so a child can
    only get it while the parent holds no TPU client — and worker output goes
    through temp files (pipes can deadlock on the remote-compile helper's
    inherited fds).  On rc!=0 the child's stderr tail is printed: r3's rc=1
    rungs left zero evidence of why (VERDICT r3 weak #3).  With
    want_err=True returns (recs, stderr_tail_str) so the caller can react to
    the failure mode (the pretrain ladder skips larger rungs after an OOM)."""
    import subprocess
    import tempfile

    if timeout_s <= 0:
        print(f"worker {args_list}: no budget left, skipped", file=sys.stderr)
        return ([], "") if want_err else []
    with tempfile.TemporaryFile(mode="w+") as out, \
            tempfile.TemporaryFile(mode="w+") as err:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + args_list,
                stdout=out, stderr=err,
                env={**os.environ, **(env_extra or {})}, timeout=timeout_s)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        out.seek(0)
        recs = []
        for ln in out.read().splitlines():
            if ln.strip().startswith("{"):
                try:
                    recs.append(json.loads(ln))
                except json.JSONDecodeError:
                    pass
        tail_str = ""
        if rc != 0:
            err.seek(0)
            tail = err.read().splitlines()[-15:]
            tail_str = "\n".join(tail)
            print(f"worker {args_list} rc={rc} (timeout_s={timeout_s:.0f}, "
                  f"{len(recs)} partial result(s)); stderr tail:",
                  file=sys.stderr)
            for ln in tail:
                print(f"  | {ln}", file=sys.stderr)
        return (recs, tail_str) if want_err else recs


def main():
    # ---- subprocess worker modes (one device workload each) ----
    # persistent compilation cache: full-size executables (~6 min each on the
    # axon remote-compile path) are a one-time per-machine cost; a prewarmed
    # cache turns every worker below into seconds of executable loading
    from spmm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if "--decode-only" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--decode-only") + 1])
        default = DEVICE_BATCHES if steps == MAX_STEPS else FULL_STEPS_BATCHES
        env_b = os.environ.get("SPMM_DECODE_BATCHES")
        batches = (tuple(int(b) for b in env_b.split(",")) if env_b
                   else default)
        def emit_partial(v):
            print(json.dumps({"value": round(v, 3), "partial": True}),
                  flush=True)
        print(json.dumps({"value": bench_spmm_tpu_laddered(
            max_steps=steps, device_batches=batches, emit=emit_partial)}))
        return
    if "--decode-suite" in sys.argv:
        # both decode lengths in ONE process: imports + init + jax client
        # setup are paid once, and each result line flushes the moment it
        # lands so a timeout mid-100-step-compile keeps the 60-step headline
        # (and a cumulative partial line lands after every timed batch, so a
        # dispatch stall mid-timing-loop keeps the completed batches too)
        def emit60(v):
            print(json.dumps({"which": "headline", "value": round(v, 3),
                              "partial": True}), flush=True)
        def emit100(v):
            print(json.dumps({"which": "100step", "value": round(v, 3),
                              "partial": True}), flush=True)
        print(json.dumps({"which": "headline", "value": bench_spmm_tpu_laddered(
            max_steps=MAX_STEPS, device_batches=(512, 256), emit=emit60)}),
            flush=True)
        print(json.dumps({"which": "100step", "value": bench_spmm_tpu_laddered(
            max_steps=FULL_STEPS, device_batches=(512, 256), emit=emit100)}),
            flush=True)
        return
    if "--pretrain-only" in sys.argv:
        print(json.dumps(bench_pretrain()))
        return
    if "--pipeline-only" in sys.argv:
        print(json.dumps(bench_pipeline()))
        return
    if "--smiles2pv-only" in sys.argv:
        print(json.dumps(bench_smiles2pv_line()))
        return
    if "--rxn-greedy-only" in sys.argv:
        print(json.dumps(bench_rxn_greedy_line()))
        return

    # ---- orchestrator: one global wall-clock budget, headline first ----
    t_start = time.monotonic()
    budget_s = float(os.environ.get("SPMM_BENCH_BUDGET_S", "1500"))

    def remaining() -> float:
        return budget_s - (time.monotonic() - t_start)

    for note in pending_gates():
        print(note, flush=True)

    # 1+2. DECODE SUITE: the 60-step HEADLINE then the 100-step line, in one
    #    worker (startup + client setup paid once; each line flushes as it
    #    lands, so a kill mid-100-step keeps the headline — _run_worker now
    #    parses partial output).  The shared chip's contention makes single
    #    readings untrustworthy in BOTH directions (r4 drive: 47.3 mol/s and
    #    792.4 mol/s for the IDENTICAL workload 7 minutes apart), so an
    #    implausibly slow headline (< DECODE_SANE_FLOOR; the r2
    #    driver-witnessed XLA number was 502) earns one retry while budget
    #    remains, keeping the best reading.
    best_60, best_100 = None, None
    attempts = [(["--decode-suite"], 900, None),
                (["--decode-only", str(MAX_STEPS)], 700,
                 {"SPMM_DECODE_BATCHES": "256,128"}),
                (["--decode-only", str(MAX_STEPS)], 600,
                 {"SPMM_DECODE_BATCHES": "128,64"})]
    for args_list, cap, env in attempts:
        # within one attempt, a completed (non-partial) reading supersedes
        # the cumulative partials that led up to it: at batch 256 only two
        # batches run, so a 1-batch partial is the noisier estimate and
        # max() would bias the headline upward for free (ADVICE r4)
        fin = {"headline": None, "100step": None}
        part = {"headline": None, "100step": None}
        for rec in _run_worker(args_list, min(cap, remaining() - 30), env):
            v = rec.get("value")
            if v is None:
                continue
            which = "100step" if rec.get("which") == "100step" else "headline"
            if rec.get("partial"):
                part[which] = v      # last partial = most batches completed
            else:
                fin[which] = max(fin[which] or 0.0, v)
        cand_60 = fin["headline"] if fin["headline"] is not None \
            else part["headline"]
        cand_100 = fin["100step"] if fin["100step"] is not None \
            else part["100step"]
        if cand_60 is not None:
            best_60 = max(best_60 or 0.0, cand_60)
        if cand_100 is not None:
            best_100 = max(best_100 or 0.0, cand_100)
        if best_60 is not None and best_60 >= DECODE_SANE_FLOOR:
            break
        if remaining() < 430:   # even a warm retry needs ~400s on this chip
            break

    headline = None
    if best_60 is not None:
        baseline = _load_baseline("torch_cpu_mol_per_sec", MAX_STEPS)
        headline = {
            "metric": "pv2smiles_beam_k2_throughput",
            "value": round(best_60, 3),
            "unit": "mol/s",
            "vs_baseline": round(best_60 / baseline, 2) if baseline else None,
        }
        print(json.dumps(headline), flush=True)

    line_100 = None
    if best_100 is None and remaining() > 400:
        # the suite died before its 100-step half: one dedicated attempt at
        # the reference's REAL decode cap (d_pv2smiles_single.py:86)
        for rec in _run_worker(["--decode-only", str(FULL_STEPS)],
                               min(540, remaining() - 30),
                               env_extra={"SPMM_DECODE_BATCHES": "128,64"}):
            if rec.get("value") is not None:
                best_100 = rec["value"]
    if best_100 is not None:
        b100 = _load_baseline("torch_cpu_mol_per_sec_100", FULL_STEPS)
        line_100 = {
            "metric": "pv2smiles_beam_k2_throughput_100step",
            "value": round(best_100, 3),
            "unit": "mol/s",
            "vs_baseline": round(best_100 / b100, 2) if b100 else None,
        }
        print(json.dumps(line_100), flush=True)

    # 3. host-pipeline line (no TPU involved; cheap)
    pipeline_line = None
    for rec in _run_worker(["--pipeline-only"], min(180, remaining() - 30)):
        if rec.get("metric"):
            pipeline_line = rec
            print(json.dumps(rec), flush=True)

    # 3b. smiles2pv + rxn-greedy throughput: the two remaining reference
    #     decode surfaces (d_smiles2pv.py:29-75, d_rxn_prediction.py:55-81)
    #     get their first driver witness here (VERDICT r4 item 3).  Budget-
    #     gated: each is ~1-2 min on a warm compile cache; skipped cleanly
    #     when the decode suite ate the window.  vs_baseline is the torch-CPU
    #     reference-strategy rate, measured once and cached like the decode
    #     baseline.
    for flag, base_key in (("--smiles2pv-only", "torch_cpu_smiles2pv"),
                           ("--rxn-greedy-only", "torch_cpu_rxn_greedy")):
        # one retry on a dead worker: an r5 drive lost the (compile-cached!)
        # smiles2pv line to a 420 s startup stall that never even reached
        # "compiling" — transient client-setup contention, not a compile
        for attempt in range(2):
            if remaining() < 240:
                print(f"{flag} skipped: {remaining():.0f}s budget left",
                      file=sys.stderr)
                break
            landed = False
            for rec in _run_worker([flag], min(420, remaining() - 30)):
                if rec.get("metric"):
                    landed = True
                    base = _load_baseline(base_key, 0)
                    if base:
                        rec["vs_baseline"] = round(rec["value"] / base, 2)
                    print(json.dumps(rec), flush=True)
            if landed:
                break
            if attempt == 0:
                print(f"{flag}: no result, one retry", file=sys.stderr)

    # 4. pretrain ladder, LAST: each rung is a FRESH process (a
    #    RESOURCE_EXHAUSTED attempt leaves the jax client unable to allocate,
    #    so in-process fallback lies), direct large batches first (reference
    #    per-GPU batch is 96, SPMM_pretrain.py:16), gradient accumulation as
    #    the low-HBM fallback.  Every failed rung costs a full-size compile
    #    (~6-10 min), so the ladder is strictly budget-bounded.
    # rung order: batch 64 direct first — donation halves state HBM so it
    # fits the shared chip (the r3/early-r4 non-donating step OOMed there)
    # and its executable is compile-cached, landing in ~3 min.  96 (the
    # reference's per-GPU batch, SPMM_pretrain.py:16) is second: its compile
    # FAILS today (the remote chipless AOT compiler cannot fit the program —
    # ~10 min to an HTTP 500), so it must never be the first rung; an OOM at
    # 64 skips it via the floor.  Then 64 via accumulation (microbatch 32,
    # the low-HBM batch>=64 fallback) and plain 32/16.
    rungs = [(64, 1), (96, 1), (64, 2), (96, 3), (32, 1), (16, 1)]
    pretrain_line, best_value = None, None
    plausible_recs = []   # every plausible rung reading, for the MFU line
    attempted = set()     # configs that got a worker call (ladder or extras)
    oom_floor = None   # smallest per-microbatch size that hit RESOURCE_EXHAUSTED

    def run_rung(bs, accum):
        """One pretrain worker call; returns a plausible rec or None (and
        updates the OOM floor).  Shared-chip measurement sanity: the axon
        runtime has produced both physically-impossible fast timings
        (block_until_ready returning early -> "MFU" 3.4) and pathological
        slow ones (52 s/step at a config that runs in ~1 s)."""
        nonlocal oom_floor
        attempted.add((bs, accum))
        recs, err_tail = _run_worker(
            ["--pretrain-only"],
            min(PRETRAIN_TIMEOUT_S, remaining() - 60),
            env_extra={"SPMM_PRETRAIN_BATCH": str(bs),
                       "SPMM_PRETRAIN_ACCUM": str(accum)},
            want_err=True)
        # prefer the completed rec; fall back to the last flushed partial
        # (most windows completed) when the worker died mid-run
        with_value = [r for r in recs if r.get("value") is not None]
        finals = [r for r in with_value if not r.get("partial")]
        rec = finals[-1] if finals else (with_value[-1] if with_value
                                         else None)
        if rec is None:
            if "RESOURCE_EXHAUSTED" in err_tail:
                micro = bs // accum
                oom_floor = min(oom_floor or micro + 1, micro)
            return None
        mfu_v = rec.get("mfu")
        if mfu_v is not None and mfu_v > 0.85:
            print(f"pretrain rung bs={bs} accum={accum}: implausible "
                  f"mfu={mfu_v}, discarded", file=sys.stderr)
            return None
        plausible_recs.append(rec)
        return rec

    retried = set()
    i = 0
    while i < len(rungs):
        bs, accum = rungs[i]
        i += 1
        # with a prewarmed compile cache a rung is ~1-2 min of executable
        # loading + timing; only a cold compile costs ~10 min, so the guard
        # is low enough that fallback rungs still run after one failure
        # (r4 drive: a 64-rung OOM left 471s and the old 480 guard starved
        # the 32 rung that would have landed)
        if remaining() < 240:
            print(f"pretrain ladder stopped: {remaining():.0f}s budget left",
                  file=sys.stderr)
            break
        micro = bs // accum
        if oom_floor is not None and micro >= oom_floor:
            print(f"pretrain rung bs={bs} accum={accum}: skipped "
                  f"(microbatch {micro} >= OOMed {oom_floor})",
                  file=sys.stderr)
            continue
        rec = run_rung(bs, accum)
        if rec is None:
            continue
        if best_value is None or rec["value"] > best_value:
            best_value = rec["value"]
            pretrain_line = json.dumps(rec)
            print(pretrain_line, flush=True)
        if rec["value"] >= 100:          # clearly healthy measurement
            break
        # a pathologically slow reading is usually transient contention:
        # retry the SAME rung once — its executable is now in the compile
        # cache, so the retry costs ~1-2 min vs a fresh ~10-min compile for
        # the next rung (r4 drive: the 32 rung read 2.4 samples/s, then the
        # ladder burned its remaining budget compiling the next rung cold)
        if (bs, accum) not in retried:
            retried.add((bs, accum))
            i -= 1
            print(f"pretrain rung bs={bs} accum={accum}: suspiciously slow "
                  f"({rec['value']} samples/s), retrying same rung (cached)",
                  file=sys.stderr)
            continue
        print(f"pretrain rung bs={bs} accum={accum}: suspiciously slow "
              f"({rec['value']} samples/s), trying next rung",
              file=sys.stderr)

    # 4b. post-ladder extras (VERDICT r4 items 1 and 4): the ladder above
    #     optimizes "best samples/s, largest batch first" and breaks at the
    #     first healthy rung — but best-MFU and the reference's per-device
    #     batch-96 semantics are DIFFERENT optima that the break structurally
    #     starved in r4.  Spend leftover budget on them, highest priority
    #     first: (32,1) is the historical MFU record config (r2: 0.555), and
    #     (96,3) emulates the reference per-GPU batch (SPMM_pretrain.py:16)
    #     via accumulation since direct 96 cannot compile on this runtime.
    # (96,3) first: with rbg it is simultaneously near-best samples/s, the
    # reference per-GPU batch witness (SPMM_pretrain.py:16), AND strong MFU
    # (r5: 213.8 samples/s, 0.3617) — if the budget only buys one extra,
    # that is the one.  (128,4) is the measured throughput/MFU record
    # (r5: 215.0 samples/s, 0.3637): microbatch 32 is the per-sample sweet
    # spot (batch-64 direct runs 13% worse per sample) and accumulation
    # amortizes the fixed optimizer/EMA/queue cost — saturating by accum 4
    # (148.9 ms/microstep vs 149.7 at accum 3 vs 154.5 standalone), so
    # deeper accumulation is not worth another rung.  (32,1) last: the
    # per-sample sweet-spot witness.  All three are compile-cached.
    extras = [(96, 3, "reference-batch-96 rung"),
              (128, 4, "throughput/MFU record rung"),
              (32, 1, "microbatch sweet-spot rung")]
    for bs, accum, why in extras:
        if (bs, accum) in attempted:
            continue
        micro = bs // accum
        if oom_floor is not None and micro >= oom_floor:
            continue
        if remaining() < 270:
            print(f"pretrain extra ({why}) skipped: "
                  f"{remaining():.0f}s budget left", file=sys.stderr)
            continue
        rec = run_rung(bs, accum)
        if rec is not None and rec["value"] < 100 and remaining() > 270:
            print(f"pretrain extra bs={bs} accum={accum}: suspiciously slow "
                  f"({rec['value']} samples/s), one cached retry",
                  file=sys.stderr)
            rec2 = run_rung(bs, accum)
            rec = rec2 if rec2 is not None and rec2["value"] > rec["value"] \
                else rec
        if rec is not None:
            print(json.dumps(rec), flush=True)
        elif (bs, accum) == (96, 3):
            # the reference-batch witness is a VERDICT deliverable: record
            # the reason it did not land in the JSON stream, not just stderr
            print(json.dumps({"note": "pretrain rung batch=96 accum=3 did "
                              "not land (worker failed or OOMed; see bench "
                              "stderr)"}), flush=True)

    # 4c. best-MFU line: MFU and samples/s are different optima (VERDICT r4
    #     weak #1) — report the best PLAUSIBLE utilization witnessed across
    #     every rung this run alongside the throughput line.
    mfu_recs = [r for r in plausible_recs if r.get("mfu")]
    if mfu_recs:
        best = max(mfu_recs, key=lambda r: r["mfu"])
        print(json.dumps({
            "metric": "pretrain_mfu",
            "value": best["mfu"],
            "unit": "model_flop_utilization",
            "vs_baseline": None,
            "samples_per_sec": best["value"],
            "batch": best.get("batch"),
            "accum": best.get("accum"),
            "step_ms_best": best.get("step_ms_best"),
            "step_ms_windows": best.get("step_ms_windows"),
            "step_ms_device": best.get("step_ms_device"),
        }), flush=True)

    # final line = the headline, re-printed so last-JSON-line parsers (the
    # driver's BENCH_r*.json "parsed" field) record the north-star metric.
    # If the headline never landed, fall back to the strongest line that did
    # (a real decode/pretrain number recorded at rc=0 beats rc=1 with none).
    pretrain_rec = json.loads(pretrain_line) if pretrain_line else None
    final = headline or line_100 or pretrain_rec or pipeline_line
    if final is not None:
        print(json.dumps(final), flush=True)
        if headline is None:
            print("headline decode bench did not land this run — final line "
                  "is the best fallback metric", file=sys.stderr)
    else:
        print("no benchmark landed this run — see stderr above",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
