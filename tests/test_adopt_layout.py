"""Winner-picking logic for the layout-flag adoption tool."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from adopt_layout_winner import parse_results, pick_winner


def _line(arm, sec, cost=-11.9376, options=None, error=None):
    d = {"arm": arm}
    if error:
        d["error"] = error
        return json.dumps(d)
    d.update({"options": options if options is not None else {"f": "true"},
              "sec_per_iter": sec, "disc_cost": cost})
    return json.dumps(d)


def test_picks_fastest_qualifying_arm():
    lines = [
        "=== layout_ab (budget 7200s) ===",
        _line("base", 0.0246, options=None),
        _line("negotiation", 0.0240),            # 2.4% — qualifies
        _line("autotune", 0.0230),               # 6.5% — qualifies, fastest
        _line("latch_rhs", 0.0244),              # <2% — too small
        _line("untiled_layout", 0.0200, cost=-3.0),  # fast but wrong loss
        _line("broken", 0.0, error="No such compile option"),
        "garbage not json {",
    ]
    results = parse_results(lines)
    assert set(results) >= {"base", "negotiation", "autotune"}
    win, why = pick_winner(results)
    assert why is None
    label, r, gain = win
    assert label == "autotune"
    assert gain > 0.06


def test_no_base_or_no_qualifier():
    win, why = pick_winner(parse_results([_line("autotune", 0.02)]))
    assert win is None and "base" in why
    win, why = pick_winner(parse_results([
        _line("base", 0.0246, options=None), _line("slow", 0.0300)]))
    assert win is None


def test_rerun_supersedes():
    results = parse_results([
        _line("base", 0.0246, options=None),
        _line("autotune", 0.0200),
        _line("autotune", 0.0260),  # later rerun is slower — wins dedup
    ])
    assert results["autotune"]["sec_per_iter"] == 0.0260
    win, _ = pick_winner(results)
    assert win is None


def test_combo_candidates_exclude_loss_deviating_arms():
    # layout_ab's combo pass must not merge an arm whose disc_cost moved:
    # the merged measurement would fail adopt_layout_winner's loss gate.
    from layout_ab import combo_candidates

    results = parse_results([
        _line("base", 0.0246, options=None),
        _line("negotiation", 0.0240),                 # -2.4%, loss matches
        _line("layout_hints_off", 0.0239),            # -2.8%, loss matches
        _line("fusion_layout_update", 0.0238, cost=-13.52),  # faster, wrong loss
        _line("latch_rhs", 0.02455),                  # <1% — too small
    ])
    cand = combo_candidates(results)
    assert set(cand) == {"negotiation", "layout_hints_off"}


def test_combo_candidates_no_base():
    from layout_ab import combo_candidates

    assert combo_candidates(parse_results([_line("autotune", 0.02)])) == {}
