"""bench.py regression guard: per-query history comparison (no Spark —
pure logic over BENCH_HISTORY.jsonl records)."""

import json

import bench


def _run(queries, sf=0.1):
    return {
        "metric": "headline_queries_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
    }


def test_regression_guard_against_historical_best(tmp_path, monkeypatch):
    hist = tmp_path / "hist.jsonl"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))

    # no history: nothing can regress
    assert bench.check_regressions(_run({"q1": 5.0})) == {}

    bench.append_history(_run({"q1": 1.0, "q2": 2.0}))
    bench.append_history(_run({"q1": 1.4, "q2": 1.8}))  # best: q1=1.0 q2=1.8

    # within factor*best + slack: fine
    assert bench.check_regressions(_run({"q1": 1.8, "q2": 2.0})) == {}
    # beyond it: flagged against the BEST prior run, not the latest
    got = bench.check_regressions(_run({"q1": 2.1, "q2": 2.0}))
    assert got == {"q1": (2.1, 1.0)}
    # new query with no baseline: never flagged
    assert bench.check_regressions(_run({"q_new": 30.0})) == {}
    # different sf does not share baselines
    assert bench.check_regressions(_run({"q1": 9.0}, sf=0.01)) == {}

    # history is append-only JSONL with timestamps
    lines = [json.loads(x) for x in hist.read_text().splitlines()]
    assert len(lines) == 2 and all("ts" in r for r in lines)


def test_repo_history_seeded_for_driver_sf():
    """The committed history must contain the r1 baseline at sf 0.1 so the
    driver-run bench compares against something real."""
    runs = bench.load_history(0.1)
    assert runs, "BENCH_HISTORY.jsonl missing the sf0.1 baseline"
    assert any("ltss_states" in r.get("queries", {}) for r in runs)


def test_noise_retry_selection(tmp_path, monkeypatch):
    """The noise pass retries exactly the queries measuring >1.2x their
    recent-history best (+slack); no history means no retries."""
    hist = tmp_path / "hist.jsonl"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))

    assert bench.queries_needing_noise_retry({"q1": 9.0}, 0.1) == []

    bench.append_history(_run({"q1": 1.0, "q2": 2.0}))
    got = bench.queries_needing_noise_retry(
        {"q1": 1.35, "q2": 2.2, "q3": 50.0}, 0.1
    )
    # q1 1.35 > 1.0*1.2+0.1=1.3 -> retry; q2 2.2 < 2.0*1.2+0.1 -> fine;
    # q3 has no history -> never flagged
    assert got == ["q1"]


def test_noise_retries_iterate_until_inside_band(tmp_path, monkeypatch):
    """apply_noise_retries keeps re-timing a flagged query across passes
    until it lands inside the noise band (the recorded number is the min),
    and gives up after MAX_NOISE_PASSES for a genuine regression so the
    gate still sees it slow."""
    hist = tmp_path / "hist.jsonl"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))
    bench.append_history(_run({"q1": 1.0, "q2": 1.0}))

    # noisy query: successive re-times 1.6 -> 1.25 (inside 1.0*1.2+0.1)
    seq = iter([1.6, 1.25, 0.9])
    timings = {"q1": 2.0, "q2": 1.1}
    log = bench.apply_noise_retries(timings, 0.1, lambda name: next(seq))
    assert timings == {"q1": 1.25, "q2": 1.1}  # q2 never flagged
    assert log == ["q1", "q1"]  # stopped as soon as it entered the band

    # genuine regression: every re-time reproduces the slow number —
    # budget exhausts, the slow value stands for the regression gate
    timings = {"q1": 2.0}
    log = bench.apply_noise_retries(timings, 0.1, lambda name: 2.0)
    assert timings == {"q1": 2.0}
    assert log == ["q1"] * bench.MAX_NOISE_PASSES


def _quiet_run(queries, sf=0.1, load_avg=1.0, quiet=True):
    r = _run(queries, sf)
    r["load_avg"] = load_avg
    r["quiet"] = quiet
    return r


def test_contended_run_never_updates_bests(tmp_path, monkeypatch):
    """Quiet-to-quiet comparison (VERDICT r8 item 3): a contended-window
    run is recorded in history but must never become the baseline best —
    neither for the regression gate nor for noise-retry selection."""
    hist = tmp_path / "hist.jsonl"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))

    bench.append_history(_quiet_run({"q1": 2.0}))
    # a lucky contended run measuring 0.5s lands in history...
    bench.append_history(_quiet_run({"q1": 0.5}, load_avg=19.3, quiet=False))

    # ...but the quiet baseline stays 2.0: 2.4s is inside 2.0*1.5+0.4
    assert bench.check_regressions(_quiet_run({"q1": 2.4})) == {}
    # and noise retries key off the quiet best too (2.0*1.2+0.1 = 2.5)
    assert bench.queries_needing_noise_retry({"q1": 2.45}, 0.1) == []
    # sanity: had the 0.5s contended run counted, both would have flagged
    assert bench.quiet_history(0.1) == [
        r for r in bench.load_history(0.1) if r.get("quiet", True)
    ]
    assert len(bench.quiet_history(0.1)) == 1


def test_pre_load_tag_history_grandfathered_as_quiet(tmp_path, monkeypatch):
    """Records written before the load tag existed carry no quiet field;
    they must stay baseline-eligible or the guard would start from zero."""
    hist = tmp_path / "hist.jsonl"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))
    bench.append_history(_run({"q1": 1.0}))  # legacy record, no tag
    got = bench.check_regressions(_quiet_run({"q1": 9.0}))
    assert got == {"q1": (9.0, 1.0)}


def test_wait_for_quiet_window_retries_then_gives_up(monkeypatch):
    """VERDICT r11 items 2+8: a contended pre-Spark load sample sleeps and
    resamples (bounded), returns early the moment a quiet sample lands,
    and proceeds anyway after the attempt budget."""
    samples = iter([(9.0, 8.0), (7.5, 7.0), (0.8, 1.1)])
    slept = []
    monkeypatch.setattr(bench, "host_load", lambda: next(samples))
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    monkeypatch.delenv("LTSS_BENCH_REQUIRE_QUIET", raising=False)
    assert bench.wait_for_quiet_window() == (0.8, 1.1)
    assert slept == [bench.QUIET_WAIT_SLEEP_S] * 2

    # the WAIT condition also keys on load5 (the post-sweep shadow: load1
    # calm while load5 carries ambient contention) — but only the wait;
    # the recorded quiet tag stays load1-only
    samples = iter([(1.2, 9.7), (1.0, 2.0)])
    slept.clear()
    monkeypatch.setattr(bench, "host_load", lambda: next(samples))
    assert bench.wait_for_quiet_window() == (1.0, 2.0)
    assert slept == [bench.QUIET_WAIT_SLEEP_S]

    # never goes quiet: bounded attempts, then run with the contended value
    monkeypatch.setattr(bench, "host_load", lambda: (9.9, 9.9))
    slept.clear()
    assert bench.wait_for_quiet_window() == (9.9, 9.9)
    assert slept == [bench.QUIET_WAIT_SLEEP_S] * bench.QUIET_WAIT_ATTEMPTS


def test_wait_for_quiet_window_respects_opt_out_and_unknown_load(monkeypatch):
    """LTSS_BENCH_REQUIRE_QUIET=0 skips the wait entirely; an unmeasurable
    load (-1.0) counts as quiet (the ADVICE r9 grandfathering rationale)."""
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    monkeypatch.setattr(bench, "host_load", lambda: (9.9, 9.9))
    monkeypatch.setenv("LTSS_BENCH_REQUIRE_QUIET", "0")
    assert bench.wait_for_quiet_window() == (9.9, 9.9)
    assert slept == []
    monkeypatch.delenv("LTSS_BENCH_REQUIRE_QUIET", raising=False)
    monkeypatch.setattr(bench, "host_load", lambda: (-1.0, -1.0))
    assert bench.wait_for_quiet_window() == (-1.0, -1.0)
    assert slept == []
