"""Step-timing and profiler-hook tests (SURVEY §5.1 — the observability
layer the reference lacks)."""

import io
import os
import time

from gecco_tpu.cli import main
from gecco_tpu.profiling import TIMER, StageTimer, timed, xla_trace

from conftest import reference_path

ORF_DATA = reference_path("test_orf", "data")
MINIPFAM = reference_path("test_hmmer", "data", "minipfam.hmm")


def test_stage_timer_aggregates_in_order():
    timer = StageTimer()
    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("b"):
        pass
    with timer.stage("a"):
        pass
    summary = timer.summary()
    assert list(summary) == ["a", "b"]
    calls, total = summary["a"]
    assert calls == 2 and total >= 0.01
    timer.reset()
    assert timer.summary() == {}


def test_timed_decorator_records():
    timer_len = len(TIMER.records)

    @timed("unit-test-stage")
    def work(x):
        return x + 1

    assert work(1) == 2
    assert TIMER.records[timer_len:] == [("unit-test-stage", TIMER.records[-1][1])]


def test_xla_trace_noop_without_dir():
    with xla_trace(None):
        pass


def test_cli_run_reports_stage_timing(tmp_path):
    stream = io.StringIO()
    code = main([
        "-vv", "run",
        "-g", os.path.join(ORF_DATA, "BGC0001737.fna"),
        "--hmm", MINIPFAM,
        "-o", str(tmp_path),
        "--force-tsv",
    ], stream)
    assert code == 0, stream.getvalue()
    log = stream.getvalue()
    for stage in ("extract-genes", "annotate-domains",
                  "predict-probabilities", "extract-clusters"):
        assert f"timing: {stage}:" in log, log
