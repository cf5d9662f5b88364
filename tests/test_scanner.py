"""Consumer-side wire-format scanner conformance (manager.go:122-216):
1 MB line cap, per-item insert isolation, error/log/unparseable message
classification — the Go scanner loop's semantics over the S5 JSON-lines
stream."""

import json

import pytest

from fundamental_ray.sources.jsonl_sink import (
    MAX_LINE_BYTES,
    LineTooLongError,
    error_message,
    scan_messages,
)


def _items_line(*items):
    return json.dumps({"type": "items", "data": list(items)})


def test_scan_roundtrip_and_complete():
    lines = [
        _items_line({"url": "u1", "price": 100}),
        _items_line({"url": "u2"}),
        json.dumps({"type": "complete", "data": {"status": "success", "total_items": 2}}),
    ]
    res = scan_messages(lines)
    assert [i["url"] for i in res.items] == ["u1", "u2"]
    assert res.completes == [{"status": "success", "total_items": 2}]
    assert res.unparsed == 0


def test_scan_oversized_line_aborts():
    # bufio.Scanner ErrTooLong: the whole scan errors out (manager.go:212-214)
    big = _items_line({"url": "u", "pad": "x" * (MAX_LINE_BYTES + 100)})
    with pytest.raises(LineTooLongError):
        scan_messages([_items_line({"url": "ok"}), big])


def test_scan_item_failure_continues_per_item():
    # manager.go:146-156: one failing insert is logged + skipped, the rest
    # of the batch AND the stream continue
    seen = []

    def on_item(item):
        if item["url"] == "bad":
            raise RuntimeError("boom")
        seen.append(item["url"])

    lines = [
        _items_line({"url": "a"}, {"url": "bad"}, {"url": "b"}),
        _items_line({"url": "c"}),
    ]
    res = scan_messages(lines, on_item=on_item)
    assert seen == ["a", "b", "c"]
    assert res.inserted == 3 and res.insert_failed == 1


def test_scan_error_and_log_classification():
    lines = [
        error_message("Spider failed", "traceback..."),
        json.dumps({"type": "error", "data": "not-a-dict"}),  # parse-fail → skip
        json.dumps({"level": "WARNING", "msg": "w", "time": "t"}),
        "plain text noise",
        json.dumps({"type": "items", "data": "not-a-list"}),  # parse-fail → skip
    ]
    res = scan_messages(lines)
    assert res.errors == [{"message": "Spider failed", "details": "traceback..."}]
    assert res.logs == [("WARNING", "w")]
    assert res.unparsed == 1
    assert res.items == []
