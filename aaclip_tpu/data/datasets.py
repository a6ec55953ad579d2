"""jsonl-backed datasets and a threaded, prefetching batch loader.

Metadata format matches the reference (dataset/metadata/*/full-shot.jsonl,
README.md:28-33): one JSON record per line with ``image_path``, ``label``,
``class_name`` and, for anomalous samples, ``mask_path``.

The loader replaces torch DataLoader: a thread pool decodes/augments images
into pinned numpy batches while the accelerator is busy; batch shapes stay
static (the final ragged batch is padded and carries ``n_valid``).
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from aaclip_tpu.data import transforms as T
from aaclip_tpu.data.registry import CLASS_NAMES, DATASETS, DatasetSpec

def metadata_root() -> str:
    """Directory holding <dataset>/{full,N}-shot.jsonl; override with
    AACLIP_METADATA (evaluated lazily for tests/CLIs)."""
    return os.environ.get(
        "AACLIP_METADATA",
        os.path.join(os.path.dirname(__file__), "metadata"),
    )


@dataclasses.dataclass
class Record:
    image_path: str
    label: int
    class_name: str
    mask_path: Optional[str] = None


def read_jsonl(path: str) -> List[Record]:
    records = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            m = json.loads(line)
            records.append(Record(
                image_path=m["image_path"],
                label=int(m["label"]),
                class_name=m["class_name"],
                mask_path=m.get("mask_path"),
            ))
    return records


def metadata_path(dataset_name: str, shot: int = -1) -> str:
    """few-shot ``{shot}-shot.jsonl`` or ``full-shot.jsonl``
    (reference dataset/__init__.py:189-197)."""
    fname = f"{shot}-shot.jsonl" if shot > 0 else "full-shot.jsonl"
    return os.path.join(metadata_root(), dataset_name, fname)


@dataclasses.dataclass
class TrainDataset:
    """Randomly-augmented training view (text or image stage).

    ``device_augment=True`` skips the host-side joint geometric
    augmentation (color jitter / resize / normalize still run here); the
    training loop then applies ops/augment.py on device per batch.
    """
    spec: DatasetSpec
    records: List[Record]
    img_size: int
    text_stage: bool
    seed: int = 111
    device_augment: bool = False

    def __len__(self) -> int:
        return len(self.records)

    def get(self, idx: int, epoch: int) -> dict:
        r = self.records[idx]
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx, int(self.text_stage)])
        )
        img, mask = T.preprocess_train(
            os.path.join(self.spec.data_path, r.image_path),
            os.path.join(self.spec.data_path, r.mask_path) if r.mask_path else None,
            self.img_size, r.label, rng, self.text_stage,
            geometric=not self.device_augment,
            uint8=self.device_augment,
        )
        return {"image": img, "mask": mask, "label": r.label,
                "class_name": r.class_name, "file_name": r.image_path}


@dataclasses.dataclass
class TestDataset:
    """Deterministic single-class evaluation view.  ``uint8=True`` emits raw
    pixels for the device-fused normalization path."""
    spec: DatasetSpec
    records: List[Record]
    img_size: int
    class_name: str
    uint8: bool = False

    def __len__(self) -> int:
        return len(self.records)

    def get(self, idx: int, epoch: int = 0) -> dict:
        r = self.records[idx]
        img, mask = T.preprocess_test(
            os.path.join(self.spec.data_path, r.image_path),
            os.path.join(self.spec.data_path, r.mask_path) if r.mask_path else None,
            self.img_size, r.label, uint8=self.uint8,
        )
        return {"image": img, "mask": mask, "label": r.label,
                "class_name": r.class_name, "file_name": r.image_path}


def get_train_datasets(dataset_name: str, img_size: int, shot: int = -1,
                       seed: int = 111, device_augment: bool = False):
    """(text_dataset, image_dataset) over the same metadata
    (reference dataset/__init__.py:188-202)."""
    spec = DATASETS[dataset_name]
    records = read_jsonl(metadata_path(dataset_name, shot))
    return (
        TrainDataset(spec, records, img_size, text_stage=True, seed=seed,
                     device_augment=device_augment),
        TrainDataset(spec, records, img_size, text_stage=False, seed=seed,
                     device_augment=device_augment),
    )


def get_test_datasets(dataset_name: str, img_size: int,
                      uint8: bool = False) -> Dict[str, TestDataset]:
    """{class_name: dataset} (reference dataset/__init__.py:203-216)."""
    spec = DATASETS[dataset_name]
    records = read_jsonl(metadata_path(dataset_name, -1))
    out = {}
    for class_name in CLASS_NAMES[dataset_name]:
        cls_records = [r for r in records if r.class_name == class_name]
        out[class_name] = TestDataset(spec, cls_records, img_size, class_name,
                                      uint8=uint8)
    return out


class BatchLoader:
    """Threaded prefetch loader producing dense numpy batches.

    Batches have a static ``batch_size``; the final ragged batch is padded by
    repeating its last sample and reports ``n_valid``.  Optionally shards
    sample indices across data-parallel hosts.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 seed: int = 111, num_workers: int = 4, prefetch: int = 2,
                 pad_final: bool = True, host_id: int = 0, num_hosts: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        # queue.Queue(maxsize=0) would mean UNBOUNDED — the producer could
        # decode a whole epoch ahead of the consumer
        self.prefetch = max(1, prefetch)
        self.pad_final = pad_final
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.epoch = 0

    def _indices(self) -> tuple:
        """(this host's indices, count of REAL ones among them).

        Multi-host shards are equalized: every host gets exactly
        ceil(n / num_hosts) indices — an unequal split would have hosts
        running different numbers of batches, desyncing the collective
        training steps (the short host's peers hang in their psum).  The
        at-most-one wrap-around pad index lands at the tail and is
        reported INVALID through the final batch's n_valid, so it never
        contributes to losses or metrics.
        """
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch]))
            rng.shuffle(idx)
        mine = idx[self.host_id::self.num_hosts]
        n_real = mine.size
        if self.num_hosts > 1:
            per = -(-idx.size // self.num_hosts)  # ceil
            if mine.size < per:
                mine = np.concatenate([mine, idx[:per - mine.size]])
        return mine, n_real

    def __len__(self) -> int:
        n = self._indices()[0].size
        if self.pad_final:
            return (n + self.batch_size - 1) // self.batch_size
        return n // self.batch_size

    def _assemble(self, samples: List[dict], n_valid: int) -> dict:
        while len(samples) < self.batch_size:
            samples.append(samples[-1])
        return {
            "image": np.stack([s["image"] for s in samples]),
            "mask": np.stack([s["mask"] for s in samples]),
            "label": np.array([s["label"] for s in samples], np.int32),
            "class_name": [s["class_name"] for s in samples],
            "file_name": [s["file_name"] for s in samples],
            "n_valid": n_valid,
        }

    def __iter__(self) -> Iterator[dict]:
        indices, n_real = self._indices()
        epoch = self.epoch
        batches = [(indices[i:i + self.batch_size],
                    max(0, min(self.batch_size, n_real - i)))
                   for i in range(0, len(indices), self.batch_size)]
        if not self.pad_final:
            batches = [bv for bv in batches
                       if len(bv[0]) == self.batch_size]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that aborts when the consumer abandoned the
            # iterator (otherwise the producer thread would block forever)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for b, n_valid in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(
                            lambda i: self.dataset.get(int(i), epoch), b))
                        if not _put(self._assemble(samples, n_valid)):
                            return
                _put(None)
            except BaseException as e:  # propagate to the consumer
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # in the finally: a consumer that breaks out early (or aborts
            # on a worker exception) must still advance the epoch, or the
            # next pass replays the identical shuffle order and per-sample
            # augmentation streams
            self.epoch += 1
