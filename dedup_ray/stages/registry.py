"""User-extension surface (SURVEY §2.10): named ``Dataset -> Dataset`` stages.

The reference's only extension points are CLI knobs and class boundaries
(``/root/reference/dedup/dedup.py:513-646``); the Ray-Data re-expression is
composition — users register named stages (any ``(Dataset, DedupConfig) ->
Dataset`` callable, typically a ``map_batches`` UDF) and list them in
``DedupConfig.user_stages`` as ``((hook_point, stage_name), ...)``.  The
pipeline applies them lazily at the hook point, so a user stage adds zero
extra Dataset executions — it fuses into the surrounding plan.

Hook points in ``pipelines.dedup.near_dedup_pipeline``:
  * ``"docs"``   — after html->text extraction, before exact dedup (custom
    cleaning / filtering / language gating);
  * ``"output"`` — after output assembly, before return (custom scoring /
    projection / routing).
"""

from __future__ import annotations

from typing import Callable

from ray.data import Dataset

_STAGES: dict[str, Callable] = {}


def register_stage(name: str):
    """Decorator: register ``fn(ds: Dataset, cfg: DedupConfig) -> Dataset``
    under ``name`` (last registration wins, so tests can re-register)."""

    def deco(fn: Callable) -> Callable:
        _STAGES[name] = fn
        return fn

    return deco


def get_stage(name: str) -> Callable:
    try:
        return _STAGES[name]
    except KeyError:
        raise KeyError(
            f"unknown user stage {name!r}; registered: {sorted(_STAGES)}"
        ) from None


def apply_stages(ds: Dataset, cfg, point: str) -> Dataset:
    """Apply every ``(point, name)`` entry of ``cfg.user_stages`` in order."""
    for hook, name in getattr(cfg, "user_stages", ()) or ():
        if hook == point:
            ds = get_stage(name)(ds, cfg)
    return ds
