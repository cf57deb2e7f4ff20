"""Orchestrator logic of bench.py, driven with fake workers.

The real bench needs the one shared TPU chip and ~25 min; these tests pin the
budget-critical control flow instead — rung ordering, OOM-floor skipping, the
same-rung retry on a pathologically slow reading (the axon runtime's observed
failure modes, NOTES.md), and the headline-re-printed-last contract the
driver's "last JSON line" parser relies on.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    return mod


class FakeWorkers:
    """Scripted _run_worker: dispatches on the worker args + env."""

    def __init__(self, pretrain_script):
        self.pretrain_calls = []       # (batch, accum) in call order
        self.pretrain_script = list(pretrain_script)

    def __call__(self, args_list, timeout_s, env_extra=None, want_err=False):
        if "--decode-suite" in args_list:
            recs = [{"which": "headline", "value": 800.0},
                    {"which": "100step", "value": 400.0}]
        elif "--decode-only" in args_list:
            recs = [{"value": 800.0}]
        elif "--pipeline-only" in args_list:
            recs = [{"metric": "host_pipeline_samples_per_sec",
                     "value": 100000.0, "unit": "samples/s",
                     "vs_baseline": None}]
        elif "--pretrain-only" in args_list:
            self.pretrain_calls.append((int(env_extra["SPMM_PRETRAIN_BATCH"]),
                                        int(env_extra["SPMM_PRETRAIN_ACCUM"])))
            recs, err = self.pretrain_script.pop(0)
            return (recs, err) if want_err else recs
        else:  # pragma: no cover
            raise AssertionError(f"unexpected worker {args_list}")
        return (recs, "") if want_err else recs


def run_main(bench, monkeypatch, capsys, fake):
    monkeypatch.setattr(bench, "_run_worker", fake)
    bench.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    return lines


def pretrain_rec(bs, accum, value, mfu=0.5):
    return ([{"metric": "pretrain_samples_per_sec_chip", "value": value,
              "unit": "samples/s/chip", "vs_baseline": None, "mfu": mfu,
              "batch": bs, "accum": accum}], "")


def test_oom_floor_skips_larger_microbatches(bench, monkeypatch, capsys):
    # 64 OOMs -> 96 skipped without a worker call -> the accum rung
    # (microbatch 32) lands
    fake = FakeWorkers([
        ([], "jax.errors.JaxRuntimeError: RESOURCE_EXHAUSTED: TPU OOM"),
        pretrain_rec(64, 2, 310.0),
    ])
    lines = run_main(bench, monkeypatch, capsys, fake)
    assert fake.pretrain_calls == [(64, 1), (64, 2)]
    pretrain = [l for l in lines if l.get("metric") ==
                "pretrain_samples_per_sec_chip"]
    assert pretrain[-1]["batch"] == 64 and pretrain[-1]["accum"] == 2


def test_slow_rung_retries_same_config_once(bench, monkeypatch, capsys):
    # the r4 pathology: 2.4 samples/s on a config that runs at ~300 — the
    # retry must hit the SAME rung (cached executable), not compile the next
    fake = FakeWorkers([
        pretrain_rec(64, 1, 2.4, mfu=0.0042),
        pretrain_rec(64, 1, 305.0),
    ])
    lines = run_main(bench, monkeypatch, capsys, fake)
    assert fake.pretrain_calls == [(64, 1), (64, 1)]
    pretrain = [l for l in lines if l.get("metric") ==
                "pretrain_samples_per_sec_chip"]
    # both readings printed, best kept; healthy one stops the ladder
    assert pretrain[0]["value"] == 2.4 and pretrain[-1]["value"] == 305.0


def test_slow_retry_still_slow_falls_through(bench, monkeypatch, capsys):
    fake = FakeWorkers([
        pretrain_rec(64, 1, 2.4, mfu=0.0042),
        pretrain_rec(64, 1, 3.1, mfu=0.005),
        pretrain_rec(96, 1, 410.0),
    ])
    run_main(bench, monkeypatch, capsys, fake)
    assert fake.pretrain_calls == [(64, 1), (64, 1), (96, 1)]


def test_headline_reprinted_last(bench, monkeypatch, capsys):
    fake = FakeWorkers([pretrain_rec(64, 1, 300.0)])
    lines = run_main(bench, monkeypatch, capsys, fake)
    assert lines[-1]["metric"] == "pv2smiles_beam_k2_throughput"
    assert lines[-1]["value"] == 800.0
    # and the 100-step line from the suite worker landed too
    assert any(l.get("metric") == "pv2smiles_beam_k2_throughput_100step"
               for l in lines)


def test_implausible_mfu_discarded(bench, monkeypatch, capsys):
    # axon block_until_ready early-return pathology: "MFU" 3.4 is not a
    # record, it is a lie — must not be printed as a result line
    fake = FakeWorkers([
        pretrain_rec(64, 1, 5000.0, mfu=3.4),
        pretrain_rec(96, 1, 320.0),
    ])
    lines = run_main(bench, monkeypatch, capsys, fake)
    pretrain = [l for l in lines if l.get("metric") ==
                "pretrain_samples_per_sec_chip"]
    assert [p["value"] for p in pretrain] == [320.0]
    assert fake.pretrain_calls == [(64, 1), (96, 1)]


class ScriptedDecodeWorkers(FakeWorkers):
    """FakeWorkers whose decode workers follow a per-call script instead of
    always succeeding — models a timed-out worker whose already-flushed
    partial lines are all the parent gets back."""

    def __init__(self, decode_script, pretrain_script):
        super().__init__(pretrain_script)
        self.decode_script = list(decode_script)
        self.decode_calls = []

    def __call__(self, args_list, timeout_s, env_extra=None, want_err=False):
        if "--decode-suite" in args_list or "--decode-only" in args_list:
            self.decode_calls.append(list(args_list))
            recs = self.decode_script.pop(0)
            return (recs, "") if want_err else recs
        return super().__call__(args_list, timeout_s, env_extra, want_err)


def test_partial_headline_from_timed_out_worker_kept(bench, monkeypatch,
                                                     capsys):
    # r4 prewarm pathology: the decode-suite worker stalled mid-timing-loop
    # and was killed at 900 s — with cumulative partial emission its flushed
    # partial line IS the headline, no retry burned (it is above the sane
    # floor), and it is re-printed last for the driver's last-line parser.
    fake = ScriptedDecodeWorkers(
        decode_script=[[{"which": "headline", "value": 620.0,
                         "partial": True}],
                       [{"value": 400.0}]],      # dedicated 100-step fallback
        pretrain_script=[pretrain_rec(64, 1, 300.0)])
    lines = run_main(bench, monkeypatch, capsys, fake)
    # the partial is above the floor: no 60-step retry — the only follow-up
    # decode call is the dedicated 100-step fallback
    assert len(fake.decode_calls) == 2
    assert fake.decode_calls[1] == ["--decode-only", "100"]
    assert lines[-1]["metric"] == "pv2smiles_beam_k2_throughput"
    assert lines[-1]["value"] == 620.0


def test_subfloor_partial_retried_and_best_kept(bench, monkeypatch, capsys):
    # a contention-artifact partial (below DECODE_SANE_FLOOR) still earns
    # the retry; the best reading across attempts wins
    fake = ScriptedDecodeWorkers(
        decode_script=[[{"which": "headline", "value": 47.0,
                         "partial": True}],
                       [{"value": 810.0}],       # 60-step retry
                       [{"value": 400.0}]],      # dedicated 100-step fallback
        pretrain_script=[pretrain_rec(64, 1, 300.0)])
    lines = run_main(bench, monkeypatch, capsys, fake)
    assert len(fake.decode_calls) == 3
    assert fake.decode_calls[1] == ["--decode-only", "60"]
    assert lines[-1]["value"] == 810.0
