"""Native (C++) runtime components + ctypes bindings.

  * phoc.cpp       — PHOC text descriptor (the reference's one native
                     op, cphoc.c, with a batch API)
  * tsv_reader.cpp — streaming base64-TSV object-feature parser (the
                     LXMERT data loader's hot path)

Built on first use with g++ (``build()``); pure-python fallbacks exist
for both (data/vqa.load_obj_tsv python path; ``phoc_py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtmmx_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3 -shared)."""
    srcs = [os.path.join(_DIR, "phoc.cpp"),
            os.path.join(_DIR, "tsv_reader.cpp")]
    if force or not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in srcs):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", _LIB_PATH] + srcs)
    return _LIB_PATH


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build())
        _lib.phoc_build.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_float)]
        _lib.phoc_build.restype = ctypes.c_int
        _lib.phoc_build_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib.phoc_build_batch.restype = ctypes.c_int
        _lib.phoc_dim.restype = ctypes.c_int
        _lib.tsv_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib.tsv_open.restype = ctypes.c_int64
        _lib.tsv_count.argtypes = [ctypes.c_int64]
        _lib.tsv_count.restype = ctypes.c_int64
        _lib.tsv_feat_dim.argtypes = [ctypes.c_int64]
        _lib.tsv_feat_dim.restype = ctypes.c_int
        _lib.tsv_get.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        _lib.tsv_get.restype = ctypes.c_int
        _lib.tsv_close.argtypes = [ctypes.c_int64]
        _lib.tsv_open_mt.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.c_int]
        _lib.tsv_open_mt.restype = ctypes.c_int64
        _lib.loader_create.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        _lib.loader_create.restype = ctypes.c_int64
        _lib.loader_next.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        _lib.loader_next.restype = ctypes.c_int
        _lib.loader_num_batches.argtypes = [ctypes.c_int64]
        _lib.loader_num_batches.restype = ctypes.c_int64
        _lib.loader_destroy.argtypes = [ctypes.c_int64]
    return _lib


# --------------------------------------------------------------------------
# PHOC
# --------------------------------------------------------------------------

def build_phoc(word: str) -> np.ndarray:
    """604-dim PHOC vector (build_phoc.py equivalent, native path)."""
    out = np.zeros(604, np.float32)
    rc = lib().phoc_build(
        word.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"unknown character in word {word!r}")
    return out


def build_phoc_batch(words: List[str]) -> np.ndarray:
    out = np.zeros((len(words), 604), np.float32)
    blob = b"\0".join(w.encode() for w in words) + b"\0"
    bad = lib().phoc_build_batch(
        blob, len(words), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if bad >= 0:
        raise ValueError(f"unknown character in word {words[bad]!r}")
    return out


def phoc_py(word: str) -> np.ndarray:
    """Pure-python PHOC (fallback + test oracle). Arithmetic in float32
    to match the C implementations' ≥0.5 boundary behaviour (cphoc.c
    uses float; e.g. the middle char of a 3-letter word lands exactly
    on the 0.5 overlap boundary and rounds differently in float64)."""
    f32 = np.float32
    unigrams = "abcdefghijklmnopqrstuvwxyz0123456789"
    bigrams = ["th", "he", "in", "er", "an", "re", "es", "on", "st", "nt",
               "en", "at", "ed", "nd", "to", "or", "ea", "ti", "ar", "te",
               "ng", "al", "it", "as", "is", "ha", "et", "se", "ou", "of",
               "le", "sa", "ve", "ro", "ra", "ri", "hi", "ne", "me", "de",
               "co", "ta", "ec", "si", "ll", "so", "na", "li", "la", "el"]
    out = np.zeros(604, np.float32)
    n = len(word)
    if n == 0:
        return out
    for i, ch in enumerate(word):
        ci = unigrams.index(ch)
        c0, c1 = f32(i) / f32(n), f32(i + 1) / f32(n)
        base = 0
        for level in range(2, 6):
            for region in range(level):
                lo = max(c0, f32(region) / f32(level))
                hi = min(c1, f32(region + 1) / f32(level))
                if f32(f32(hi - lo) / f32(c1 - c0)) >= f32(0.5):
                    out[(base + region) * 36 + ci] = 1.0
            base += level
    off = 14 * 36
    for i in range(n - 1):
        bg = word[i:i + 2]
        if bg not in bigrams:
            continue
        bi = bigrams.index(bg)
        b0, b1 = f32(i) / f32(n), f32(i + 2) / f32(n)
        for region in range(2):
            lo = max(b0, f32(region) / f32(2))
            hi = min(b1, f32(region + 1) / f32(2))
            if f32(f32(hi - lo) / f32(b1 - b0)) >= f32(0.5):
                out[off + region * 50 + bi] = 1.0
    return out


# --------------------------------------------------------------------------
# TSV
# --------------------------------------------------------------------------

class tsv:
    """Namespace for the native TSV reader (see data/vqa.load_obj_tsv)."""

    MAX_BOXES = 100

    @staticmethod
    def load_obj_tsv(path: str, topk: Optional[int] = None):
        L = lib()
        # parallel parse when cores are available; tsv_open_mt(n<=1)
        # falls back to the sequential parser (and a small topk over a
        # huge file prefers the early-stopping sequential scan)
        n_threads = 1 if topk is not None else min(os.cpu_count() or 1, 8)
        h = L.tsv_open_mt(path.encode(), -1 if topk is None else topk,
                          n_threads)
        if h < 0:
            raise IOError(f"cannot open {path}")
        try:
            count = L.tsv_count(h)
            feat_dim = L.tsv_feat_dim(h)
            out = []
            for i in range(count):
                img_id = ctypes.create_string_buffer(256)
                ih = ctypes.c_int()
                iw = ctypes.c_int()
                boxes = np.zeros((tsv.MAX_BOXES, 4), np.float32)
                feats = np.zeros((tsv.MAX_BOXES, max(feat_dim, 1)), np.float32)
                oid = np.zeros(tsv.MAX_BOXES, np.int64)
                oconf = np.zeros(tsv.MAX_BOXES, np.float32)
                n = L.tsv_get(
                    h, i, img_id, 256, ctypes.byref(ih), ctypes.byref(iw),
                    boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    oid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    oconf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    tsv.MAX_BOXES)
                out.append({
                    "img_id": img_id.value.decode(),
                    "img_h": ih.value, "img_w": iw.value, "num_boxes": n,
                    "boxes": boxes[:n].copy(),
                    "features": feats[:n].copy(),
                    "objects_id": oid[:n].copy(),
                    "objects_conf": oconf[:n].copy(),
                })
            return out
        finally:
            L.tsv_close(h)


# --------------------------------------------------------------------------
# Prefetching batch loader (the torch-DataLoader-worker equivalent)
# --------------------------------------------------------------------------

class TsvStore:
    """Keeps a native TSV store open (unlike ``tsv.load_obj_tsv``,
    which copies everything into python dicts and closes). Parse is
    multithreaded (``tsv_open_mt``)."""

    def __init__(self, path: str, topk: Optional[int] = None,
                 n_threads: int = 0):
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 2, 8)
        L = lib()
        self._L = L
        self.handle = L.tsv_open_mt(
            path.encode(), -1 if topk is None else topk, n_threads)
        if self.handle < 0:
            raise IOError(f"cannot open {path}")
        self.count = L.tsv_count(self.handle)
        self.feat_dim = L.tsv_feat_dim(self.handle)

    def close(self):
        if self.handle >= 0:
            self._L.tsv_close(self.handle)
            self.handle = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class BatchLoader:
    """Background-threaded batch assembly over an open ``TsvStore``:
    model-ready padded ``{features [B, M, D], boxes [B, M, 4] (LXMERT-
    normalised), num_boxes [B], valid k}`` batches prefetched depth-
    deep so host assembly overlaps device compute."""

    def __init__(self, store: TsvStore, order, batch: int,
                 max_boxes: int = 36, depth: int = 3, n_threads: int = 2,
                 normalize: bool = True):
        self.store = store
        self.batch = batch
        self.max_boxes = max_boxes
        order = np.ascontiguousarray(np.asarray(order, np.int64))
        self.handle = lib().loader_create(
            store.handle,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(order), batch, max_boxes, depth, n_threads,
            1 if normalize else 0)
        if self.handle < 0:
            raise ValueError("loader_create failed (bad store/order)")
        self.num_batches = lib().loader_num_batches(self.handle)

    def __iter__(self):
        D = self.store.feat_dim
        while True:
            feats = np.empty((self.batch, self.max_boxes, D), np.float32)
            boxes = np.empty((self.batch, self.max_boxes, 4), np.float32)
            nbox = np.empty((self.batch,), np.int32)
            k = lib().loader_next(
                self.handle,
                feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                nbox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if k < 0:
                raise RuntimeError("loader_next on a destroyed loader")
            if k == 0:
                return
            yield {"features": feats, "boxes": boxes,
                   "num_boxes": nbox, "k": int(k)}

    def close(self):
        if self.handle >= 0:
            lib().loader_destroy(self.handle)
            self.handle = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
