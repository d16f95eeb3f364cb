"""Training metrics writers.

The reference shipped TensorBoard deps (``tb-nightly``/``tbp-nightly``,
``requirements.txt:5-6``) and gitignored a ``tensorboard/`` directory but
never wrote a single summary (SURVEY.md §5.5) — its only durable metric is
``loss.csv``. This module adds the missing writer: TensorBoard scalars next
to (never instead of) the reference-compatible CSV.
"""

from typing import Optional


class MetricsWriter:
    """Scalar metrics sink; TensorBoard-backed when a log dir is given.

    Deliberately tiny surface (``scalar``/``flush``/``close``) so the trainer
    stays decoupled from the backend; with ``log_dir=None`` every call is a
    no-op and nothing is imported.
    """

    def __init__(self, log_dir: Optional[str] = None):
        self._writer = None
        if log_dir:
            # self-contained event-file writer (tb_events): this image has
            # no tensorboard package, and scalars don't need one
            from .tb_events import EventFileWriter

            self._writer = EventFileWriter(log_dir)

    @property
    def active(self) -> bool:
        return self._writer is not None

    def scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), int(step))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None
