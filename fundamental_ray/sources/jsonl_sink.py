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
