"""Sample/SampleList batch containers (mmf/common/sample.py equivalent).

Dict-of-arrays batches with attribute access, collation of
heterogeneous samples by padding to the bucket max, and device
placement. TPU-first: collation pads to STATIC bucket sizes so one
compiled program serves a whole dataset.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import numpy as np


class Sample(dict):
    """A single example; attribute access sugar over dict."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key) from None

    def __setattr__(self, key, value):
        self[key] = value


class SampleList(dict):
    """A batch: same keys, leading batch axis on every array leaf."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key) from None

    def __setattr__(self, key, value):
        self[key] = value

    @property
    def batch_size(self) -> int:
        for v in self.values():
            if hasattr(v, "shape") and len(v.shape) > 0:
                return v.shape[0]
        return 0

    def to_device(self, sharding=None):
        import jax

        out = SampleList()
        for k, v in self.items():
            if isinstance(v, np.ndarray):
                out[k] = (jax.device_put(v, sharding) if sharding is not None
                          else jax.device_put(v))
            else:
                out[k] = v
        return out


def _pad_to(arr: np.ndarray, length: int, axis: int = 0,
            pad_value=0) -> np.ndarray:
    if arr.shape[axis] == length:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, length - arr.shape[axis])
    return np.pad(arr, pad, constant_values=pad_value)


def collate(samples: Sequence[Mapping[str, Any]],
            pad_lengths: Optional[Mapping[str, int]] = None,
            pad_values: Optional[Mapping[str, Any]] = None) -> SampleList:
    """Stack samples into a SampleList, padding axis-0 of ragged array
    fields to ``pad_lengths[key]`` (or the batch max)."""
    pad_lengths = pad_lengths or {}
    pad_values = pad_values or {}
    out = SampleList()
    keys = samples[0].keys()
    for key in keys:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            tgt = pad_lengths.get(key,
                                  max(v.shape[0] for v in vals))
            pv = pad_values.get(key, 0)
            out[key] = np.stack([_pad_to(v, tgt, 0, pv) for v in vals])
        elif isinstance(vals[0], (int, float, bool, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = list(vals)
    return out
