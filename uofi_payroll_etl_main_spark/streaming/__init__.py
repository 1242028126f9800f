"""Windowed event analytics: batch-first, Structured-Streaming-ready.

The same windowed aggregations run in two modes:
  * batch   -- F.window / F.session_window over a static events frame.
  * stream  -- readStream + watermark + the identical agg + writeStream
               (see `streams.py`), so a batch-validated query promotes to
               a continuous pipeline without rewriting logic.
"""
