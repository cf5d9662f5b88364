"""Scheduler cadence — the reference's job slots composed over the crawl
engine (internal/scheduler/scheduler.go:84-282).

The Go scheduler ticks every minute under one ``jobMutex`` (all jobs
serialize) and fires:

- startup: active spiders for every city (scheduler.go:88-97);
- 00:00 → sold spiders, all cities sequentially (scheduler.go:126-131);
- 00:30 → district hull update (scheduler.go:133-141);
- every hour at :00 → active spiders (scheduler.go:143-148);
- refresh: cities are assigned (weekday, hour) slots — all midnight slots
  across the week first, then all 4am slots, then 8/12/16/20
  (scheduler.go:209-259, timeSlots=[0,4,8,12,16,20], Sunday-first) — and a
  city's refresh spider runs when the tick matches its slot.

``schedule_slots`` is the literal slot-assignment transcription;
``jobs_for_tick`` yields one tick's job list in the serialized order the
Go code executes them (sold → hulls → active → refresh); ``simulate_week``
folds a whole week of ticks into the composed job sequence. The actual
job bodies (crawl / merge / refresh / hulls) are the engine's own
pipelines — the integration test drives a day of cadence against a real
store.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

TIME_SLOTS = [0, 4, 8, 12, 16, 20]
DAYS_PER_WEEK = 7  # Sunday-first, matching Go's time.Weekday (Sunday == 0)


def schedule_slots(cities: list[str]) -> pd.DataFrame:
    """scheduler.go:209-243: build the slot list (all day×hour pairs, hour
    blocks in TIME_SLOTS order, Sunday-first within each block) and assign
    cities by index; cities beyond the 42 slots stay unscheduled."""
    schedule: list[tuple[int, int]] = []
    for hour in TIME_SLOTS:
        for day in range(DAYS_PER_WEEK):
            schedule.append((day, hour))
    rows = []
    for i, city in enumerate(cities):
        day, hour = schedule[i] if i < len(schedule) else (None, None)
        rows.append({"city": city, "day": day, "hour": hour})
    return pd.DataFrame(rows)


@dataclass(frozen=True)
class Job:
    day: int
    hour: int
    minute: int
    job_type: str  # 'active' | 'sold' | 'refresh' | 'hulls'
    city: str | None  # None for the hull update


def jobs_for_tick(
    day: int, hour: int, minute: int, cities: list[str],
    slots: pd.DataFrame | None = None,
) -> list[Job]:
    """One tick's serialized job list (executeScheduledJobs order:
    sold check → hull check → active check → refresh check)."""
    slots = schedule_slots(cities) if slots is None else slots
    jobs: list[Job] = []
    if hour == 0 and minute == 0:
        jobs += [Job(day, hour, minute, "sold", c) for c in cities]
    if hour == 0 and minute == 30:
        jobs.append(Job(day, hour, minute, "hulls", None))
    if minute == 0:
        jobs += [Job(day, hour, minute, "active", c) for c in cities]
        for _, s in slots.iterrows():
            if s["day"] == day and s["hour"] == hour:
                jobs.append(Job(day, hour, minute, "refresh", s["city"]))
    return jobs


def simulate_week(cities: list[str]) -> list[Job]:
    """Fold 7×24×60 ticks into the composed ordered job sequence."""
    slots = schedule_slots(cities)
    out: list[Job] = []
    for day in range(DAYS_PER_WEEK):
        for hour in range(24):
            for minute in (0, 30):  # only :00 and :30 ever fire jobs
                out += jobs_for_tick(day, hour, minute, cities, slots)
    return out
