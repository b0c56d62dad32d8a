"""ADVICE r13 closures.

1. readers.py — the balanced /Font resource scan must NOT register
   refs that live inside a NESTED ``<<...>>`` (an inline font dict's
   own /FontFile, /FontDescriptor, /ToUnicode internals): with
   first-wins ``name in fonts`` semantics a bogus entry could shadow a
   later REAL resource ref of the same name.
2. tools/calib_probe.py — a non-numeric argv must not crash before the
   probe line prints; fall back to the default with a usage note.
3. bench.py — when the anchor-only floor plus fully-drained breach
   lists STILL exceed the stdout budget (future payload-key growth),
   warn on stderr instead of silently risking the driver-tail
   parsed:null cliff.
"""

import json
import sys

import bench
from debgpt7_8_with_vectordb_spark.sources.readers import (
    _nested_dict_spans,
    _pdf_font_cmaps,
)

sys.path.insert(0, "tools")
from calib_probe import _parse_nprobes  # noqa: E402


# ---------------------------------------------------------------- item 1


def test_nested_dict_spans_balanced_and_unterminated():
    body = b"a <<b <<c>> d>> e <<f"
    spans = _nested_dict_spans(body)
    assert len(spans) == 2
    s0, e0 = spans[0]
    assert body[s0:e0] == b"<<b <<c>> d>>"
    # an unterminated nested dict masks through to the end of the body
    s1, e1 = spans[1]
    assert (s1, e1) == (body.find(b"<<f"), len(body))
    assert _nested_dict_spans(b"no dicts here") == []


def test_inline_font_dict_internals_do_not_shadow_real_ref():
    # Page 1's /Font resource dict holds an INLINE font dict whose
    # body references object 8 under /FX; page 2's resource dict maps
    # the REAL /FX to object 5. First-wins would let the bogus
    # nested-ref registration (obj 8 parses a Differences table too)
    # shadow the real font's table.
    payload = (
        b"1 0 obj <</Type /Page /Resources <</Font <<"
        b"/Fa <</Type /Font /Subtype /Type1 /FX 8 0 R>> >> >> >> endobj\n"
        b"2 0 obj <</Type /Page /Resources <</Font <<"
        b"/FX 5 0 R>> >> >> endobj\n"
        b"5 0 obj <</Type /Font /Subtype /Type1 "
        b"/Encoding <</Differences [65 /zero]>> >> endobj\n"
        b"8 0 obj <</Type /FontDescriptor "
        b"/Encoding <</Differences [65 /bullet]>> >> endobj\n"
    )
    fonts = _pdf_font_cmaps(payload)
    assert b"FX" in fonts
    width, table = fonts[b"FX"]
    # the REAL resource entry (object 5) wins, not the inline dict's
    # internal ref (object 8)
    assert table[65] == "0"


def test_refs_after_inline_font_dict_still_register():
    # the balanced-scan fix (self-review r13) must survive the nested
    # skip: a ref DECLARED AFTER an inline font dict in the same
    # resource dict is outside every nested span and still registers
    payload = (
        b"1 0 obj <</Font <</Fa <</Type /Font /K 9 0 R>> /F1 5 0 R>> "
        b">> endobj\n"
        b"5 0 obj <</Type /Font /Encoding <</Differences [66 /one]>> >> "
        b"endobj\n"
        b"9 0 obj <</Type /FontDescriptor>> endobj\n"
    )
    fonts = _pdf_font_cmaps(payload)
    assert b"F1" in fonts and fonts[b"F1"][1][66] == "1"
    assert b"K" not in fonts


# ---------------------------------------------------------------- item 2


def test_calib_probe_argv_parse(capsys):
    assert _parse_nprobes(["calib_probe.py"]) == 3
    assert _parse_nprobes(["calib_probe.py", "7"]) == 7
    assert _parse_nprobes(["calib_probe.py", "0"]) == 1
    # non-numeric: default + usage note, no ValueError
    assert _parse_nprobes(["calib_probe.py", "fast"]) == 3
    err = capsys.readouterr().err
    assert "usage" in err and "'fast'" in err


# ---------------------------------------------------------------- item 3


def test_budgeted_line_warns_when_floor_exceeds_budget(capsys):
    # a future payload key large enough that the anchor floor + drained
    # breach lists can never fit: the overflow must be VISIBLE
    times = {n: 1.0 for n in bench._R1_ANCHOR}
    payload = {
        "metric": "headline_queries_total_wall",
        "value": 1.0,
        "unit": "sec",
        "queries": times,
        "sf": 0.1,
        "breaches_raw": ["x:9.99"] * 3,
        "breaches_calib": ["x:9.99"] * 3,
        "future_giant_key": "y" * (bench._STDOUT_BUDGET + 100),
    }
    line = bench._budgeted_line(payload)
    err = capsys.readouterr().err
    assert "exceeds" in err and str(bench._STDOUT_BUDGET) in err
    # the line itself is still valid JSON with the anchors intact
    parsed = json.loads(line)
    assert set(bench._R1_ANCHOR) <= set(parsed["queries"])
    # breach lists were drained before the warning fired, with true
    # counts preserved
    assert parsed["breaches_raw"] == [] and parsed["breaches_raw_n"] == 3


def test_budgeted_line_quiet_when_fits(capsys):
    line = bench._budgeted_line(
        {
            "metric": "headline_queries_total_wall",
            "value": 1.0,
            "unit": "sec",
            "queries": {"a": 1.0},
            "sf": 0.1,
        }
    )
    assert json.loads(line)["queries"] == {"a": 1.0}
    assert capsys.readouterr().err == ""
