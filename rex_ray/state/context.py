"""Engine-wide execution tuning (SURVEY.md §4 'memory pressure').

One place to apply the DataContext knobs the pipelines assume, sized
for the two payload regimes this engine serves:

* text-dominant KG extraction: default block targets are fine;
* media-heavy interleaved batches (binary payloads behind media_ref at
  rest, inlined only inside decode stages): shrink the target block
  size and the decode batch size so batch x actor-pool concurrency
  fits worker heaps (the multimodal stages already default to
  batch_size<=1024 for this reason).

Callers: bench.py, the CLI, and tests — the library itself never
mutates global context at import time.
"""

from __future__ import annotations

MEDIA_TARGET_BLOCK_BYTES = 32 * 1024 * 1024  # 32 MiB for binary payloads


def tune(media_heavy: bool = False, progress_bars: bool = False) -> None:
    """Apply engine defaults to the CURRENT DataContext (idempotent)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = progress_bars
    if media_heavy:
        ctx.target_max_block_size = MEDIA_TARGET_BLOCK_BYTES
