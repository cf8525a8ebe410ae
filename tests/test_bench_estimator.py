"""The scaling estimator's storm handling (bench._measure_pair).

No Spark here: _run_pinned is stubbed so the paired-round bookkeeping
— the void rule, replacement rounds, the all-void flag, the estimator
keys — is pinned without running the flagship job.
"""
import importlib.util
import sys

import pytest


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def _feed(bench, vals):
    it = iter(vals)
    bench._run_pinned = lambda cpus, path, reps: next(it)


ROWS = 4_000_000


def _pair(lo_sec, hi_sec):
    return [{"rows": ROWS, "best_sec": lo_sec}, {"rows": ROWS, "best_sec": hi_sec}]


class TestVoidRounds:
    def test_impossible_round_is_void_and_replaced(self, bench):
        # rnd0 eff .8, rnd1 hi SLOWER than lo (storm), rnd2 eff .9
        _feed(bench, _pair(4.0, 1.25) + _pair(4.0, 5.0) + _pair(4.0, 10 / 9.0))
        out = bench._measure_pair((2, 8), "x", rounds=2, reps=2, extend=0)
        assert out["paired_ratios"] == [0.8, 0.9]
        assert out["void_ratios"] == [0.2]
        assert out["scaling_efficiency"] == pytest.approx(0.85)
        assert "window_unusable" not in out

    def test_void_samples_stay_in_level_lists(self, bench):
        _feed(bench, _pair(4.0, 1.25) + _pair(4.0, 5.0) + _pair(4.0, 10 / 9.0))
        out = bench._measure_pair((2, 8), "x", rounds=2, reps=2, extend=0)
        # 3 rounds ran (1 void) -> 3 samples per level, storm leg included
        assert len(out["samples@2"]) == 3 and len(out["samples@8"]) == 3

    def test_all_void_window_is_flagged_not_crashed(self, bench):
        _feed(bench, _pair(4.0, 5.0) * 3)
        out = bench._measure_pair((2, 8), "x", rounds=1, reps=2, extend=0)
        assert out.get("window_unusable") is True
        assert out["paired_ratios"] == [0.2, 0.2, 0.2]
        assert out["void_ratios"] == []

    def test_replacements_bounded(self, bench):
        # rounds=2, extend=0 -> hard cap 4 attempts even if storms persist
        _feed(bench, _pair(4.0, 1.25) + _pair(4.0, 5.0) * 3)
        out = bench._measure_pair((2, 8), "x", rounds=2, reps=2, extend=0)
        assert len(out["paired_ratios"]) == 1  # only rnd0 valid
        assert len(out["void_ratios"]) == 3

    def test_dispersion_extension_still_works(self, bench):
        # valid but dispersed ratios (> 0.12 spread) extend up to +2
        _feed(bench, _pair(4.0, 2.0) + _pair(4.0, 1.0) + _pair(4.0, 1.25)
              + _pair(4.0, 1.25) + _pair(4.0, 1.25))
        out = bench._measure_pair((2, 8), "x", rounds=3, reps=2, extend=2)
        assert len(out["paired_ratios"]) == 5
        assert out["median_paired_efficiency"] == out["scaling_efficiency"]
