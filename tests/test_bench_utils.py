"""Pure-python units of bench.py (the harness runs unattended at round
end — guard the logic that doesn't need a device).

bench.py's module level imports only stdlib+numpy (jax is imported
inside the workload functions), so importing it here never touches the
tunnel.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_mfu_none_propagation():
    assert bench._mfu(None, 10.0, 1e15) is None
    assert bench._mfu(1e9, 10.0, None) is None
    assert bench._mfu(1e12, 100.0, 1e15) == 0.1


def test_annotate_s2d_logical_happy_path():
    suite = {
        "sprites_train": {"flops_per_step": 2.0e10, "ms_per_step": 8.3},
        "sprites_train_s2d": {"flops_per_step": 6.0e10,
                              "ms_per_step": 8.0},
    }
    bench.annotate_s2d_logical(suite, peak=1.97e14)
    s2d = suite["sprites_train_s2d"]
    assert s2d["flops_logical_per_step"] == 2.0e10
    # logical mfu = 2e10 * (1000/8) / 1.97e14
    assert abs(s2d["mfu_logical"] - 0.01269) < 1e-4
    # executed-FLOP fields untouched
    assert s2d["flops_per_step"] == 6.0e10
    assert "mfu_logical" not in suite["sprites_train"]


def test_annotate_s2d_logical_skips_errored_or_missing_lines():
    # errored baseline: {"error": ...} has no flops_per_step
    suite = {"sprites_train": {"error": "RuntimeError: boom"},
             "sprites_train_s2d": {"flops_per_step": 6e10,
                                   "ms_per_step": 8.0}}
    bench.annotate_s2d_logical(suite, peak=1.97e14)
    assert "mfu_logical" not in suite["sprites_train_s2d"]
    # missing s2d line (BENCH_ONLY filter): no-op, no KeyError
    bench.annotate_s2d_logical({"sprites_train": {"flops_per_step": 2e10,
                                                  "ms_per_step": 8.3}},
                               peak=None)
    # None peak: annotation still writes logical flops, mfu None
    suite2 = {
        "sprites_train": {"flops_per_step": 2.0e10, "ms_per_step": 8.3},
        "sprites_train_s2d": {"flops_per_step": 6.0e10,
                              "ms_per_step": 8.0},
    }
    bench.annotate_s2d_logical(suite2, peak=None)
    assert suite2["sprites_train_s2d"]["flops_logical_per_step"] == 2.0e10
    assert suite2["sprites_train_s2d"]["mfu_logical"] is None
