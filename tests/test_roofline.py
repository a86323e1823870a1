"""The roofline phase harness must build and run on any backend (the SoL
percentages are only meaningful on a real chip, but the phase programs and
the analytic accounting must stay correct)."""
import numpy as np

from recsys_tpu.tools import roofline


def test_roofline_phases_compile_and_run():
    phases, analytic = roofline.build_phases(64, np.random.default_rng(0))
    assert set(phases) == {"gather", "dense", "scatter", "update", "fused_bwd"}
    for name, (fn, carry) in phases.items():
        ms = roofline.time_chained(fn, carry, iters=2)
        assert ms > 0, name


def test_roofline_analytic_accounting():
    _, analytic = roofline.build_phases(128, np.random.default_rng(0))
    # dense Adam moves 7x table bytes; the gather only touches batch rows
    assert analytic["update"]["bytes"] > analytic["gather"]["bytes"]
    # gather traffic = lookups * one 512-byte physical row
    assert analytic["gather"]["bytes"] == 128 * 26 * 512
    assert analytic["dense"]["flops"] > 0 and analytic["dense"]["bytes"] == 0
    # scatter includes the cotangent read plus touched-row read-modify-write
    assert analytic["scatter"]["bytes"] > analytic["gather"]["bytes"]
