"""Anomaly-aware text anchor construction.

Reference semantics (forward_utils.py:131-192): per class, encode the 6
normal and 10 abnormal prompt sentences, L2-normalize each sentence
embedding, mean within each state, re-normalize, and stack columns into a
[embed_dim, 2] anchor (col 0 = normal, col 1 = abnormal).

TPU-first shift: all sentences for *all* classes of a dataset are tokenized
once (host) and encoded in a single batched forward — [n_classes * 16, 77]
— instead of a Python loop over classes.  Inside the stage-1 training step
the same reduction runs under jit with gradients flowing to the text
adapters.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aaclip_tpu.data.registry import CLASS_NAMES, build_prompts, resolve_real_name
from aaclip_tpu.text.bpe import tokenize

N_NORMAL = 6
N_ABNORMAL = 10
SENTENCES_PER_CLASS = N_NORMAL + N_ABNORMAL


def class_prompt_tokens(dataset_name: str, class_name: str) -> np.ndarray:
    """[16, 77] token ids: 6 normal then 10 abnormal sentences."""
    normal, abnormal = build_prompts(resolve_real_name(dataset_name, class_name))
    return tokenize(normal + abnormal)


def dataset_prompt_tokens(dataset_name: str,
                          class_names: Optional[List[str]] = None) -> np.ndarray:
    """[n_classes, 16, 77] token ids for every class of a dataset."""
    names = class_names if class_names is not None else CLASS_NAMES[dataset_name]
    return np.stack([class_prompt_tokens(dataset_name, c) for c in names])


def reduce_to_anchors(sentence_embeds: jax.Array) -> jax.Array:
    """[..., 16, D] sentence embeddings -> [..., D, 2] anchors.

    Normalize each sentence, mean per state (first 6 normal / last 10
    abnormal), re-normalize, stack as columns.
    """
    e = sentence_embeds.astype(jnp.float32)
    e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    normal = e[..., :N_NORMAL, :].mean(axis=-2)
    abnormal = e[..., N_NORMAL:, :].mean(axis=-2)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    abnormal = abnormal / jnp.linalg.norm(abnormal, axis=-1, keepdims=True)
    return jnp.stack([normal, abnormal], axis=-1)


def encode_dataset_anchors(encode_fn, dataset_name: str,
                           class_names: Optional[List[str]] = None) -> Dict[str, jax.Array]:
    """Build the class -> [D, 2] anchor dict with one batched text forward.

    ``encode_fn`` maps [N, 77] int32 tokens to [N, D] embeddings (frozen or
    adapted text encoder, jitted by the caller).
    """
    names = class_names if class_names is not None else CLASS_NAMES[dataset_name]
    tokens = dataset_prompt_tokens(dataset_name, names)  # [C, 16, 77]
    C = tokens.shape[0]
    flat = tokens.reshape(C * SENTENCES_PER_CLASS, -1)
    embeds = encode_fn(jnp.asarray(flat))
    embeds = embeds.reshape(C, SENTENCES_PER_CLASS, -1)
    anchors = reduce_to_anchors(embeds)  # [C, D, 2]
    return {name: anchors[i] for i, name in enumerate(names)}


# bump when anchor math or the token layout changes in a way the key's
# inputs cannot see
_ANCHOR_CACHE_VERSION = 1


def encode_dataset_anchors_cached(encode_fn, dataset_name: str,
                                  identity: str, cache_dir: str,
                                  class_names: Optional[List[str]] = None
                                  ) -> Dict[str, np.ndarray]:
    """Disk-cached :func:`encode_dataset_anchors` (host numpy values).

    Serving cold-start through a slow device link spends minutes in the
    text tower re-deriving anchors that are a pure function of (prompts,
    text params, adapter, precision).  The prompts / class list / tokenizer
    side is captured by hashing the token array itself; everything else
    must be captured by ``identity`` — the caller is responsible for
    folding in the text params' provenance (checkpoint file identity or
    init seed), the adapter checkpoint digest, the adapter config, the
    precision policy, and the backend platform.  A wrong-identity hit is
    silent, so over-key rather than under-key.

    Writes are atomic (tmp + os.replace); concurrent engines may race but
    both write identical bytes.
    """
    import hashlib
    import os

    names = class_names if class_names is not None else CLASS_NAMES[dataset_name]
    tokens = dataset_prompt_tokens(dataset_name, names)
    h = hashlib.sha256()
    h.update(f"v{_ANCHOR_CACHE_VERSION}|{identity}|{dataset_name}|"
             f"{','.join(names)}|".encode())
    h.update(np.ascontiguousarray(tokens).tobytes())
    path = os.path.join(cache_dir, f"anchors_{h.hexdigest()[:32]}.npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                arr = np.asarray(z["anchors"])
            if arr.shape[0] == len(names):
                return {n: arr[i] for i, n in enumerate(names)}
        except Exception:
            pass  # corrupt/partial entry: fall through and rebuild it
    out = encode_dataset_anchors(encode_fn, dataset_name, names)
    arr = np.stack([np.asarray(out[n]) for n in names])
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}.npz"
    try:
        np.savez(tmp, anchors=arr)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return {n: arr[i] for i, n in enumerate(names)}
