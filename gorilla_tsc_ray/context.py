"""Ray Data execution-context defaults for this engine.

Central place for the knobs that matter at scale (block size, progress
noise). Never calls ``ray.init`` — session ownership stays with the driver
/ bench / test fixture (see ``__ray_entry__.py`` contract).
"""

from __future__ import annotations


def tune_context(quiet: bool = True) -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    # keep default 128 MiB target block size; our payloads are small rows
    ctx.execution_options.preserve_order = False
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
