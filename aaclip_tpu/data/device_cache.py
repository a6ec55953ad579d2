"""Device-resident training dataset cache.

The round-4 host-loop profile (docs/PERFORMANCE.md) showed the stage-2
wall-vs-device gap is the PER-STEP INPUT WORK on the device side — the
~26 MB/step uint8 batch transfer over the relay link plus the augment
kernel — not the host pipeline.  Industrial anomaly-detection train sets
are small (MVTec full-shot ~3.6k images = ~4 GB at 518px uint8), so the
TPU-native fix is to upload the RAW dataset to HBM once and assemble
every batch on device: gather by index, color-jitter (image stage),
normalize, geometric-augment — all inside one jitted program whose only
per-step host input is a [B] int32 index vector and a [B] validity mask.

Correctness contract:
* Raw cache entries are the PRE-JITTER resized uint8 images + uint8
  masks (data/transforms.preprocess_train with text_stage=True,
  uint8=True — byte-identical to what the host loader would jitter).
* The on-device color jitter is Pillow's ImageEnhance chain bit-exact
  for dyadic factors (ops/augment.color_jitter_device); distribution
  matches the host path, RNG stream differs — the same rubric as
  ``--device_augment`` (docs/PARITY.md intentional deviation 3).
* Epoch shuffling reproduces BatchLoader's permutation
  (SeedSequence([seed, epoch])) and final-batch padding (repeat last,
  report n_valid), so swapping the loader changes only where batch
  assembly runs.

The cache pytree is always passed as a jitted-function ARGUMENT — closing
over it would let XLA constant-fold gigabytes (CLAUDE.md invariant).

Reference counterpart: none — the reference's DataLoader re-decodes and
re-augments on host every epoch (dataset/__init__.py:13-103).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np

from aaclip_tpu.data import transforms as T
from aaclip_tpu.data.datasets import TrainDataset


def cache_nbytes(n: int, img_size: int) -> int:
    """HBM footprint of a cached dataset: uint8 image + uint8 mask."""
    return n * (3 + 1) * img_size * img_size + n * 8


@dataclasses.dataclass
class DeviceCacheLoader:
    """Iterator of fully-assembled DEVICE batches
    ``(images_f32, mask_f32, label, class_idx, valid)`` — a drop-in for
    the train loop's BatchLoader + device_batch + maybe_augment chain.

    ``epoch`` advances after each pass (BatchLoader semantics), driving
    both the shuffle permutation and the augmentation key.
    """

    dataset: TrainDataset
    cls_to_idx: dict
    batch_size: int
    seed: int
    text_stage: bool
    aug_base: "object"  # jax PRNGKey
    jitter: bool = True

    def __post_init__(self):
        import jax
        import jax.numpy as jnp

        ds = self.dataset
        n = len(ds)
        if n == 0:
            raise ValueError("cannot cache an empty dataset")
        spec, recs = ds.spec, ds.records
        imgs = np.empty((n, 3, ds.img_size, ds.img_size), np.uint8)
        masks = np.empty((n, ds.img_size, ds.img_size), np.uint8)
        labels = np.empty((n,), np.int32)
        cidx = np.empty((n,), np.int32)
        import os
        for i, r in enumerate(recs):
            # raw = resized pre-jitter uint8 (text_stage=True skips jitter;
            # geometric=False defers augmentation — both happen on device)
            img, mask = T.preprocess_train(
                os.path.join(spec.data_path, r.image_path),
                os.path.join(spec.data_path, r.mask_path)
                if r.mask_path else None,
                ds.img_size, r.label, rng=None, text_stage=True,
                geometric=False, uint8=True)
            imgs[i] = img
            masks[i] = mask.reshape(ds.img_size, ds.img_size).astype(np.uint8)
            labels[i] = r.label
            cidx[i] = self.cls_to_idx[r.class_name]
        # one bulk upload each — the only full-dataset transfer of the run
        self._imgs = jnp.asarray(imgs)
        self._masks = jnp.asarray(masks)
        self._labels = jnp.asarray(labels)
        self._cidx = jnp.asarray(cidx)
        self.epoch = 0
        self.n = n

        from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
        from aaclip_tpu.ops.augment import (color_jitter_device,
                                            joint_geometric_augment_device_u8)

        mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
        std = jnp.asarray(CLIP_STD)[None, :, None, None]
        jitter = self.jitter and not self.text_stage

        def _assemble(imgs_c, masks_c, labels_c, cidx_c, idx, key):
            im = jnp.take(imgs_c, idx, axis=0)          # [B, 3, H, W] u8
            mk = jnp.take(masks_c, idx, axis=0)         # [B, H, W] u8
            if jitter:
                kj, key = jax.random.split(key)
                im = color_jitter_device(kj, im)
            # packed uint32 geometric gather (1/4 the gather elements);
            # normalize AFTER — bit-identical to the normalize-then-
            # gather float form on the CPU test backend
            # (test_packed_augment_matches_float_path); on TPU the
            # normalize sits on the other side of the gather, so fusion
            # could differ by an ulp — within the <=2 ulp rubric for
            # this path (docs/PARITY.md)
            out_u8, out_m, valid = joint_geometric_augment_device_u8(
                key, im, mk)
            x = jnp.where(
                valid[:, None],
                (out_u8.astype(jnp.float32) / 255.0 - mean) / std, 0.0)
            m = out_m.astype(jnp.float32) * valid.astype(jnp.float32)
            return (x, m, jnp.take(labels_c, idx, axis=0),
                    jnp.take(cidx_c, idx, axis=0))

        self._assemble = jax.jit(_assemble)
        self._fold_in = jax.random.fold_in

    def __len__(self) -> int:
        return -(-self.n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        # BatchLoader._indices' permutation, single-host form
        idx = np.arange(self.n)
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch]))
        rng.shuffle(idx)
        return idx

    def epoch_plan(self):
        """Host-side per-step inputs for the CURRENT epoch:
        [(idx int32 [B], aug key, valid float32 [B]), ...] — the shuffle
        permutation, padding, and RNG fold-in that ``__iter__`` applies,
        exposed so the fused assemble+step loop (``make_fused_step``) can
        feed step k+1's plan into step k's program."""
        idx = self._epoch_indices()
        stage = 1 if self.text_stage else 2
        plan = []
        for it in range(len(self)):
            b = idx[it * self.batch_size:(it + 1) * self.batch_size]
            n_valid = b.size
            if n_valid < self.batch_size:  # pad: repeat last sample
                b = np.concatenate(
                    [b, np.repeat(b[-1:], self.batch_size - n_valid)])
            key = self._fold_in(self._fold_in(self._fold_in(
                self.aug_base, stage), self.epoch), it)
            valid = (np.arange(self.batch_size) < n_valid).astype(
                np.float32)
            plan.append((b.astype(np.int32), key, valid))
        return plan

    def assemble(self, idx, key):
        """One batch on device: ``(images_f32, mask_f32, label, cidx)``."""
        import jax.numpy as jnp

        return self._assemble(self._imgs, self._masks, self._labels,
                              self._cidx, jnp.asarray(idx), key)

    def advance_epoch(self) -> None:
        self.epoch += 1

    def __iter__(self) -> Iterator[Tuple]:
        import jax.numpy as jnp

        try:
            for b, key, valid in self.epoch_plan():
                images, mask, label, cidx = self.assemble(b, key)
                yield images, mask, label, cidx, jnp.asarray(valid)
        finally:
            self.advance_epoch()

    def make_fused_step(self, step):
        """Fold batch k+1's assembly into step k's device program.

        ``step`` is a trainer from ``make_stage2_step`` (it must expose
        ``.raw`` — the all-arguments jitted step — and ``.visual``).
        Returns ``fused(state, images, mask, label, cidx, valid, nidx,
        nkey) -> (state', loss, (nimages, nmask, nlabel, ncidx))``.

        Rationale (round 5, the wall-vs-step gap): with separate
        programs the device executes assemble(k), step(k), assemble(k+1),
        step(k+1)... strictly serially — the assembly's gather/augment
        time adds wall per step even though every dispatch is async.  In
        ONE program the next batch's assembly has no data dependency on
        the update, so the TPU scheduler can hide its (DMA-heavy) gathers
        inside the step's MXU-bound regions instead of paying for them
        end-to-end.  The previous batch's buffers are donated — the next
        batch's outputs reuse them, so peak HBM gains only the in-flight
        copy.  The state and the frozen trunk stay ARGUMENTS (never
        closed over: XLA would constant-fold the 1.7 GB trunk,
        CLAUDE.md).  Numerics are untouched: the same assemble and step
        impls, inlined (equality-pinned in tests/test_device_cache.py).
        """
        import functools

        import jax

        step_impl = step.raw.__wrapped__    # unjitted all-arguments form
        assemble_impl = self._assemble.__wrapped__
        visual = step.visual

        @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
        def _fused(state, visual, images, mask, label, cidx, valid,
                   imgs_c, masks_c, labels_c, cidx_c, nidx, nkey):
            state, loss = step_impl(state, visual, images, mask, label,
                                    cidx, valid)
            nbatch = assemble_impl(imgs_c, masks_c, labels_c, cidx_c,
                                   nidx, nkey)
            return state, loss, nbatch

        def fused(state, images, mask, label, cidx, valid, nidx, nkey):
            import jax.numpy as jnp

            return _fused(state, visual, images, mask, label, cidx,
                          valid, self._imgs, self._masks, self._labels,
                          self._cidx, jnp.asarray(nidx), nkey)

        return fused
