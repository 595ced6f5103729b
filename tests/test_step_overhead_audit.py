"""Structural audit of the fused train step's convolution work (round-4
VERDICT item 5: "does g_grad recompute a G(zk_pos) forward the Langevin
scan already produced, and does XLA dedup it?").

The answer is a verified negative result (tools/analyze_step_overhead.py):
the scan's final forward is at z_{K-1}, so the G update's forward at zk_pos
is the first evaluation there; the optimized HLO's convolution count equals
the analytic minimum exactly — no duplicate existed, none was introduced.
This test pins that count so redundant applies can never silently creep
into the hot step.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from analyze_step_overhead import expected_conv_count, hlo_audit  # noqa: E402
from test_bench_smoke import tiny_cfg  # noqa: E402


def test_fused_step_conv_count_is_analytic_minimum():
    audit = hlo_audit(tiny_cfg())
    expect = expected_conv_count()
    # StableHLO (pre-optimization) already carries exactly the analytic
    # structure, and XLA's pipeline neither removes (no duplicates existed)
    # nor adds convolutions.
    assert audit["convs_unoptimized_hlo"] == expect, audit
    assert audit["convs_optimized_hlo"] == expect, audit
