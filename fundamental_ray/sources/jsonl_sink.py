"""S5 — reference-wire-format JSON-lines sink.

The reference streams one ``{"type": "items", "data": [<sparse item>]}``
line per listing over a pipe, then a ``complete`` trailer with the total
(pipelines.py:54-81; consumed by manager.go:122-216). This sink renders a
listings Dataset into that exact wire format so the reference's Go ingester
could consume the rebuild's output unchanged.

The wire format is inherently a serial stream (one pipe), so the writer
drains ``iter_batches`` on the driver — formatting is vectorized per batch,
and Parquet (the scalable sink) remains the primary output; this exists for
drop-in compatibility.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import ray.data

ITEM_FIELDS = [
    "url", "street", "neighborhood", "property_type", "city", "postal_code",
    "price", "year_built", "living_area", "num_rooms", "status",
    "listing_date", "selling_date", "energy_label", "scraped_at",
]


def _sparse(row: dict) -> dict:
    """items.py:26-28 — to_dict() drops None before serialization; NaN from
    Arrow nulls counts as absent too. Ints stay ints (price/year/area/rooms)."""
    out = {}
    for k in ITEM_FIELDS:
        v = row.get(k)
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if k in ("price", "year_built", "living_area", "num_rooms"):
            v = int(v)
        out[k] = v
    return out


def write_items_jsonl(listings: ray.data.Dataset, path: str) -> int:
    """Stream the Dataset into the reference's pipe format; returns the item
    count (also reported in the trailing complete message)."""
    total = 0
    with open(path, "w") as fh:
        for batch in listings.iter_batches(batch_size=4096, batch_format="pandas"):
            for row in batch.to_dict("records"):
                fh.write(json.dumps({"type": "items", "data": [_sparse(row)]}) + "\n")
                total += 1
        fh.write(
            json.dumps(
                {
                    "type": "complete",
                    "data": {
                        "status": "success",
                        "message": "Spider completed successfully",
                        "total_items": total,
                    },
                }
            )
            + "\n"
        )
    return total


def error_message(message: str, details: str = "") -> str:
    """Producer-side ``error`` wire message (pipelines.py:71-81 failure
    trailer): what the spider emits when it dies mid-run."""
    return json.dumps(
        {"type": "error", "data": {"message": message, "details": details}}
    )


MAX_LINE_BYTES = 1024 * 1024  # manager.go:123-124: bufio scanner buffer cap


@dataclass
class ScanResult:
    """Per-message-class tallies of one consumer scan (manager.go:126-210)."""

    items: list[dict] = field(default_factory=list)
    inserted: int = 0       # items the per-item callback accepted
    insert_failed: int = 0  # callback raised — logged + skipped, scan continues
    completes: list[dict] = field(default_factory=list)
    errors: list[dict] = field(default_factory=list)       # type=error payloads
    logs: list[tuple[str, str]] = field(default_factory=list)  # (level, msg)
    unparsed: int = 0       # neither spider message nor log line → debug-logged


class LineTooLongError(RuntimeError):
    """bufio.ErrTooLong analogue: a line over the 1 MB scanner buffer aborts
    the whole scan (manager.go:212-214 returns the scanner error)."""


def scan_messages(lines, on_item=None) -> ScanResult:
    """Consumer-side scanner loop, mirroring manager.go:122-216 exactly:

    - lines over 1 MB abort the scan (bufio.Scanner ErrTooLong);
    - ``items`` messages are processed ONE ITEM AT A TIME — a failing item
      (callback raising) is logged and skipped, the rest of the batch and
      the stream continue (manager.go:146-156);
    - ``items``/``error`` payloads that fail to parse are skipped with the
      stream intact (manager.go:140-143, 180-186);
    - JSON lines with a ``level`` field are treated as forwarded log
      messages; anything else unparseable is debug-logged and dropped
      (manager.go:189-210)."""
    res = ScanResult()
    for raw in lines:
        line = raw.rstrip("\n")
        if len(line.encode("utf-8", errors="replace")) > MAX_LINE_BYTES:
            raise LineTooLongError(
                f"line exceeds {MAX_LINE_BYTES} byte scanner buffer"
            )
        try:
            msg = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            res.unparsed += 1
            continue
        if isinstance(msg, dict) and msg.get("type"):
            if msg["type"] == "items":
                data = msg.get("data")
                if not isinstance(data, list):
                    continue  # "Failed to parse items data" → continue
                for item in data:
                    res.items.append(item)
                    if on_item is not None:
                        try:
                            on_item(item)
                            res.inserted += 1
                        except Exception:
                            res.insert_failed += 1  # log + continue
            elif msg["type"] == "error":
                data = msg.get("data")
                if isinstance(data, dict):
                    res.errors.append(data)
                # else: "Failed to parse error data" → continue
            elif msg["type"] == "complete":
                res.completes.append(msg.get("data") or {})
            continue
        if isinstance(msg, dict) and msg.get("level"):
            res.logs.append((msg["level"], msg.get("msg", "")))
            continue
        res.unparsed += 1
    return res


def scan_messages_file(path: str, on_item=None) -> ScanResult:
    with open(path) as fh:
        return scan_messages(fh, on_item=on_item)
