"""Prefetching batch loader.

Replaces the reference's serialized ``tf.data.map(py_func,
num_parallel_calls=1)`` + feed_dict round trip
(`/root/reference/pipeline/NiftiDataset3D.py:47-50`,
`/root/reference/model.py:735-748`) with a thread-pool prefetcher: worker
threads run the (numpy/scipy, largely GIL-releasing) sample parsers ahead
of the training loop, batches are assembled pinned-contiguous and handed to
``jax.device_put`` so the accelerator never waits on SimpleITK-style host
work. Epoch semantics match the reference: shuffle each epoch, fixed batch
size, ``drop_remainder`` (`model.py:289-293`).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from .rand import get_rng


class BatchLoader:
    """Iterate epochs of batches over a dataset with worker prefetch.

    Args:
      dataset: object with ``__len__`` and ``get_sample(i) -> (img, lbl)``.
      batch_size: samples per batch.
      shuffle: reshuffle sample order each epoch.
      drop_remainder: drop the trailing partial batch (reference behavior).
      num_workers: prefetch threads (0 = synchronous).
      prefetch: max ready samples buffered ahead.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_remainder: bool = True, num_workers: int = 2,
                 prefetch: int = 8, seed: Optional[int] = None,
                 skip_errors: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.num_workers = num_workers
        self.prefetch = max(prefetch, batch_size)
        self._epoch_rng = np.random.default_rng(seed)
        # skip_errors=True logs and drops failing samples instead of
        # aborting the epoch — the reference hard-exits the process on any
        # preprocessing error (NiftiDataset3D.py:143-147, SURVEY.md §5.3)
        self.skip_errors = skip_errors
        self.error_count = 0

    def _order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._epoch_rng.shuffle(order)
        return order

    def _iter_samples_sync(self, order) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for i in order:
            try:
                yield self.dataset.get_sample(int(i))
            except Exception as e:
                if not self.skip_errors:
                    raise
                self.error_count += 1
                print(f"BatchLoader: skipping failed sample {i}: {e}")

    def _iter_samples_threaded(self, order) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        task_q: "queue.Queue" = queue.Queue()
        done_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        for pos, i in enumerate(order):
            task_q.put((pos, int(i)))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    pos, i = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    done_q.put((pos, self.dataset.get_sample(i), None))
                except Exception as e:  # surface errors on the main thread
                    done_q.put((pos, None, e))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        # re-order results into submission order so epochs are reproducible
        pending = {}
        next_pos = 0
        try:
            for _ in range(len(order)):
                while next_pos not in pending:
                    pos, sample, err = done_q.get()
                    pending[pos] = (sample, err)
                sample, err = pending.pop(next_pos)
                next_pos += 1
                if err is not None:
                    if not self.skip_errors:
                        raise err
                    self.error_count += 1
                    print(f"BatchLoader: skipping failed sample: {err}")
                    continue
                yield sample
        finally:
            stop.set()
            while not task_q.empty():
                try:
                    task_q.get_nowait()
                except queue.Empty:
                    break

    def epoch(self) -> Iterator[Tuple[np.ndarray, ...]]:
        """Yield batches: each dataset sample tuple element is stacked along
        a new leading batch dim — ``(images, labels[, distance_maps, ...])``.
        """
        order = self._order()
        it = (self._iter_samples_threaded(order) if self.num_workers > 0
              else self._iter_samples_sync(order))
        buf = []
        for sample in it:
            buf.append(sample if isinstance(sample, tuple) else (sample,))
            if len(buf) == self.batch_size:
                yield tuple(np.stack(col) for col in zip(*buf))
                buf = []
        if buf and not self.drop_remainder:
            yield tuple(np.stack(col) for col in zip(*buf))

    def __iter__(self):
        return self.epoch()
