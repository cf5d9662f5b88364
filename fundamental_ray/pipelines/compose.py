"""User-extension surface (§2.12): ordered, declarative stage pipelines.

The reference's plugin mechanism is the Scrapy ITEM_PIPELINES dict of
priority-ordered process_item hooks (settings.py:55-58,
funda_spider.py:24-27). The rebuild equivalent: a config-declared, ordered
list of named map_batches stages applied to a Dataset — each stage is a
(name, priority, fn, options) tuple; stages run in ascending priority, each
as its own ``map_batches`` (task or actor-pool per its options).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass
class Stage:
    name: str
    priority: int
    fn: Callable  # batch fn (function) or callable class (actor pool)
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: int | None = None  # set → actor pool; None → tasks
    fn_kwargs: dict = field(default_factory=dict)


@dataclass
class PipelineConfig:
    stages: list[Stage] = field(default_factory=list)

    def add(self, name: str, priority: int, fn: Callable, **opts) -> "PipelineConfig":
        self.stages.append(Stage(name, priority, fn, **opts))
        return self

    def ordered(self) -> list[Stage]:
        return sorted(self.stages, key=lambda s: (s.priority, s.name))


def run_pipeline(ds: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    for s in config.ordered():
        kwargs: dict[str, Any] = {
            "batch_format": s.batch_format,
            "fn_kwargs": s.fn_kwargs or None,
        }
        if s.batch_size is not None:
            kwargs["batch_size"] = s.batch_size
        if s.concurrency is not None:
            kwargs["concurrency"] = s.concurrency
        kwargs = {k: v for k, v in kwargs.items() if v is not None}
        ds = ds.map_batches(s.fn, **kwargs)
    return ds
