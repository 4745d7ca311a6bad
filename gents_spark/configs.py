"""Named run profiles — the analog of GenTS's model configs.

GenTS ships per-model preset classes (``gents/configs/config.py:5-29``,
``gents_cesm3.py:6-40``, ``gents_e3sm.py``) selected via ``--model``
(``gents/cli.py:90-93,143-153``): each carries default include/exclude
patterns plus output knobs (CESM3 adds zlib compression,
``gents_cesm3.py:39``), and explicit CLI filters REPLACE the preset's
unless ``--append`` is passed (``cli.py:173-181``).

Here a profile is a preset bundle of source filters + engine knobs for a
class of token-sequence corpora.  Same override semantics: explicit
``--include-sources``/``--exclude-sources`` replace the profile's lists
unless ``--append-filters`` is set, in which case they extend them.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RunProfile:
    """Preset filters + engine knobs applied before explicit CLI args."""

    include_sources: list[str] | None = None
    exclude_sources: list[str] | None = None
    compression: str = "snappy"
    chunk_grain: str = "day"
    tiers: list[str] = field(default_factory=lambda: ["1m", "1h", "1d"])
    gapfill: str = "locf"


#: Built-in profiles.  Names describe corpus classes the way GenTS's
#: CESM3/E3SM presets describe model output layouts.
PROFILES: dict[str, RunProfile] = {
    # raw web crawl: junk sources excluded up front, aggressive
    # compression (cold data), day-grain checkpoints
    "webcrawl": RunProfile(
        exclude_sources=["spam", "boilerplate", "adult"],
        compression="zstd",
        chunk_grain="day",
    ),
    # curated corpora: smaller, hotter; coarse chunks keep the commit
    # count low, default codec keeps reads cheap
    "curated": RunProfile(
        compression="snappy",
        chunk_grain="month",
        gapfill="linear",
    ),
}


def resolve_profile(
    name: str | None,
    include_sources: list[str] | None,
    exclude_sources: list[str] | None,
    append_filters: bool = False,
) -> RunProfile:
    """Merge a named profile with explicit filters (GenTS override rule)."""
    base = PROFILES.get(name, RunProfile()) if name else RunProfile()
    if name and name not in PROFILES:
        raise ValueError(
            f"unknown profile {name!r}; available: {sorted(PROFILES)}"
        )
    inc, exc = base.include_sources, base.exclude_sources
    if append_filters:
        if include_sources:
            inc = [*(inc or []), *include_sources]
        if exclude_sources:
            exc = [*(exc or []), *exclude_sources]
    else:
        if include_sources is not None:
            inc = include_sources
        if exclude_sources is not None:
            exc = exclude_sources
    return RunProfile(
        include_sources=inc,
        exclude_sources=exc,
        compression=base.compression,
        chunk_grain=base.chunk_grain,
        tiers=base.tiers,
        gapfill=base.gapfill,
    )
