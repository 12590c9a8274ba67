"""Protocol-scale rehearsal of the three quantitative harnesses.

The reference's headline numbers come from three evaluation protocols
(BASELINE.md):

  * VisualBERT VQA perturbation — 10k samples, seed 1234, pos+neg ×
    text+image sweeps (mmf/trainers/core/evaluation_loop.py:93-97,
    README.rst:72-76);
  * LXMERT VQA perturbation — with the Faster R-CNN frontend re-run
    INSIDE the step loop exactly as the reference does
    (lxmert/lxmert/perturbation.py:110-133 calls model_usage.forward —
    image preprocessing + FRCNN — once per step);
  * DETR explanation-segmentation — COCO val images at 800px through
    Otsu → PostProcessSegm upsampling → COCOeval
    (DETR/mask_generator.py:45-158, engine.py:153-216).

The published checkpoints/datasets are not obtainable in this build
image (zero egress), so this module rehearses the ASSEMBLED pipelines
at true protocol scale with synthetic weights and data: every shape,
padding bucket, memory high-water mark and recompilation the real run
would hit is hit here, on the real chip, and the wall-clock/per-step
curves are recorded as a round artifact (PROTOCOL_r03.json). When the
real weights appear, `cli verify-parity` + these runners reproduce the
paper's metrics with no new code.

Run:  python -m transformer_mm_explainability_tpu.tools.protocol_rehearsal \
          --protocol all --out PROTOCOL_r03.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Dict, List, Optional

import numpy as np


def _now() -> float:
    return time.perf_counter()


def _memory_stats() -> Optional[Dict]:
    """Device memory high-water mark, when the backend exposes it
    (CPU and some tunneled backends return None)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
            "largest_alloc_size")
    return {k: int(stats[k]) for k in keep if k in stats}


def _phase_memory(probes: Dict) -> Dict:
    """Per-phase device-memory record — non-null on every backend.

    The tunneled PJRT plugin exposes no allocator stats
    (``memory_stats()`` is None), so each phase registers its compiled
    programs as ``probes[name] = (jit_fn, args)`` and the record falls
    back to XLA buffer-assignment totals (argument + output + temp
    bytes = the peak HBM working set each executable reserves). The
    v5e budget to judge against is 16 GB."""
    from transformer_mm_explainability_tpu.utils.profiling import (
        hlo_memory_analysis)

    rec: Dict = {"device_memory_stats": _memory_stats()}
    progs = {}
    for name, (fn, args) in probes.items():
        m = hlo_memory_analysis(fn, *args)
        if m:
            progs[name] = m
    if progs:
        rec["hlo_programs"] = progs
        peak = max(p["peak_bytes_estimate"] for p in progs.values())
        rec["peak_bytes_estimate"] = peak
        rec["peak_gb_estimate"] = round(peak / 2 ** 30, 3)
        rec["hbm_budget_gb"] = 16.0
        rec["method"] = ("xla_buffer_assignment"
                         if rec["device_memory_stats"] is None
                         else "allocator_stats+xla_buffer_assignment")
    return rec


# ---------------------------------------------------------------------------
# 1. VisualBERT perturbation at protocol scale
# ---------------------------------------------------------------------------

def rehearse_visualbert(
    num_samples: int = 10000,
    batch_size: int = 16,
    method: str = "ours_no_lrp",
    text_len: int = 128,
    num_boxes: int = 100,
    seed: int = 1234,
    sweeps: Optional[List[Dict]] = None,
    printer=print,
) -> Dict:
    """The full mmf_pert protocol shape: BERT-base VisualBERT, 128 text
    tokens + 100 FRCNN boxes, 3129 answers, 10k samples per sweep,
    pos+neg × text+image (evaluation_loop.py:93-97). Synthetic weights
    and features; batch_size rides samples on one axis (the reference
    is batch=1 — an explicit TPU redesign, harness/pert_runner.py)."""
    import jax
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.harness import perturbation as pert
    from transformer_mm_explainability_tpu.harness.pert_runner import (
        VisualBertPerturbationRunner)
    from transformer_mm_explainability_tpu.models import visual_bert as vb

    cfg = vb.VISUAL_BERT_VQA2
    params = vb.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(seed)
    if sweeps is None:
        sweeps = [{"positive": p, "text_pert": t}
                  for p in (False, True) for t in (False, True)]

    n_batches = -(-num_samples // batch_size)
    result = {"protocol": "visualbert_perturbation",
              "config": {"layers": cfg.bert.num_hidden_layers,
                         "hidden": cfg.bert.hidden_size,
                         "text_len": text_len, "num_boxes": num_boxes,
                         "num_labels": cfg.num_labels,
                         "num_samples": num_samples,
                         "batch_size": batch_size, "method": method,
                         "seed": seed},
              "sweeps": []}
    t_total0 = _now()
    probes: Dict = {}
    for sweep in sweeps:
        runner = VisualBertPerturbationRunner(
            params, cfg, method, positive=sweep["positive"],
            text_pert=sweep["text_pert"])
        accs_sum = np.zeros(len(runner.steps))
        n_done = 0
        compile_s = None
        t0 = _now()
        per_batch_ms: List[float] = []
        for b in range(n_batches):
            n = min(batch_size, num_samples - n_done)
            lens = rng.randint(8, text_len + 1, size=batch_size)
            ids = rng.randint(1, 30000, size=(batch_size, text_len))
            mask = (np.arange(text_len)[None] < lens[:, None]).astype(np.int32)
            ids = ids * mask
            batch = {
                "input_ids": jnp.asarray(ids),
                "input_mask": jnp.asarray(mask),
                "visual_embeddings": jnp.asarray(
                    rng.randn(batch_size, num_boxes, 2048)
                    .astype(np.float32)),
            }
            soft = np.zeros((batch_size, cfg.num_labels), np.float32)
            soft[np.arange(batch_size),
                 rng.randint(0, cfg.num_labels, batch_size)] = 1.0
            tb = _now()
            accs = runner.run_samples_batched(batch, soft)
            dt = _now() - tb
            if compile_s is None:
                compile_s = dt
            else:
                per_batch_ms.append(dt * 1e3)
            accs_sum += np.asarray(accs)[:n].sum(axis=0)
            n_done += n
        probes[f"pos{int(sweep['positive'])}_text"
               f"{int(sweep['text_pert'])}"] = (
            runner._program, (runner.params, batch,
                              jnp.asarray(soft)))
        wall = _now() - t0
        curve = (accs_sum / max(n_done, 1)).tolist()
        steady = (float(np.median(per_batch_ms)) / batch_size
                  if per_batch_ms else None)
        entry = {
            **sweep,
            "num_samples": n_done,
            "wall_s": round(wall, 2),
            "compile_s": round(compile_s, 2),
            "ms_per_sample_steady": (round(steady, 3)
                                     if steady is not None else None),
            "step_accuracies": [round(float(a), 6) for a in curve],
            "auc": round(float(pert.auc(np.asarray(curve),
                                        runner.steps)), 6),
        }
        result["sweeps"].append(entry)
        printer(f"visualbert pert positive={sweep['positive']} "
                f"text={sweep['text_pert']}: {n_done} samples in "
                f"{wall:.1f}s ({entry['ms_per_sample_steady']} ms/sample "
                f"steady, compile {compile_s:.1f}s)")
    result["wall_s_total"] = round(_now() - t_total0, 2)
    result["memory"] = _phase_memory(probes)
    return result


# ---------------------------------------------------------------------------
# 2. LXMERT perturbation with FRCNN inside the step loop
# ---------------------------------------------------------------------------

def rehearse_lxmert(
    num_samples: int = 200,
    image_hw=(800, 1216),
    text_len: int = 20,
    method: str = "ours_no_lrp",
    positive: bool = False,
    seed: int = 1234,
    full_protocol_samples: int = 10000,
    resume_path: Optional[str] = None,
    stall_timeout_s: float = 300.0,
    printer=print,
) -> Dict:
    """Full-size LXMERT (9/5/5 layers) + full FRCNN-VG (R101-C4,
    36 detections) at 800px, with the CNN re-run INSIDE each of the 9
    perturbation steps exactly as the reference does
    (perturbation.py:110-133: every step calls model_usage.forward →
    image preprocessing + FRCNN + LXMERT). The per-sample program is
    1 explain pass + a lax.map over 9 (FRCNN → top-box mask → LXMERT)
    steps — the reference's cost structure, on-device."""
    import jax
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.explain import lxmert as elx
    from transformer_mm_explainability_tpu.harness import perturbation as pert
    from transformer_mm_explainability_tpu.models import frcnn as jfrcnn
    from transformer_mm_explainability_tpu.models import lxmert as jlx

    fcfg = jfrcnn.FRCNN_VG
    lcfg = jlx.LXMERT_VQA
    fparams = jfrcnn.init_params(jax.random.PRNGKey(1), fcfg)
    lparams = jlx.init_params(jax.random.PRNGKey(2), lcfg)
    rng = np.random.RandomState(seed)
    H, W = image_hw
    steps = pert.LXMERT_STEPS
    M = fcfg.max_detections

    def program(fparams, lparams, image, ids, mask, soft):
        # --- explain pass: FRCNN → LXMERT capture → bi-modal relevancy
        det = jfrcnn.forward(fparams, image, fcfg)
        batch = {
            "input_ids": ids[None],
            "attention_mask": mask[None],
            "visual_feats": det["roi_features"][None],
            "visual_pos": det["normalized_boxes"][None],
            "visual_mask": det["valid"].astype(jnp.int32)[None],
        }
        scores, attn, grads = jlx.capture(lparams, batch, None, lcfg)
        _, ti = elx.generate_ours(attn, grads,
                                  text_valid=batch["attention_mask"],
                                  visual_valid=batch["visual_mask"])
        cam_image = ti[0, 0]                       # [M]
        cam = -cam_image if positive else cam_image
        n_boxes = det["valid"].sum()
        num_keep = pert._num_keep_table(steps, M)[:, n_boxes]

        def step_fn(k):
            # the reference re-runs the CNN every step on the SAME
            # image (identical features; the SELECTION changes) —
            # reproduce that cost structure faithfully
            det_k = jfrcnn.forward(fparams, image, fcfg)
            keep = pert.topk_keep_mask(cam, k, valid=det_k["valid"])
            out = jlx.forward(
                lparams, ids[None], mask[None],
                det_k["roi_features"][None],
                det_k["normalized_boxes"][None],
                visual_mask=keep.astype(jnp.int32)[None], cfg=lcfg)
            return soft[jnp.argmax(out["qa_scores"][0])]

        accs = jax.lax.map(step_fn, num_keep)      # 9 sequential steps
        return accs

    program_j = jax.jit(program)

    # resume + stall-watchdog: a multi-hour per-sample loop over the
    # tunneled device can wedge forever inside a blocked readback if
    # the tunnel drops (observed: futex_wait, zero CPU, no exception).
    # The watchdog hard-exits the process when no sample completes
    # within ``stall_timeout_s`` so a wrapper can relaunch; the seeded
    # RNG makes every sample deterministic, so the sidecar resume
    # replays exactly the same protocol from where it stopped.
    start_i, prior_wall = 0, 0.0
    accs_sum = np.zeros(len(steps))
    per_sample_ms: List[float] = []
    compile_s = None
    if resume_path:
        try:
            with open(resume_path) as f:
                st = json.load(f)
            start_i = int(st["i"])
            prior_wall = float(st["wall_s"])
            accs_sum = np.asarray(st["accs_sum"], np.float64)
            per_sample_ms = list(st["per_sample_ms"])
            compile_s = st.get("compile_s")
            printer(f"  resuming lxmert protocol at sample {start_i} "
                    f"(prior wall {prior_wall:.0f}s)")
        except (OSError, ValueError, KeyError):
            pass

    import os as _os
    import threading
    # grace for the first sample, which carries the (possibly cold)
    # remote compile — r4 measured up to 614 s on a cold cache
    heartbeat = [time.time() + 900]
    # the watchdog must die with the sample loop: left running, it
    # would hard-kill whatever comes after this phase (the DETR phase
    # of --protocol all, the post-loop memory-analysis compile, or a
    # test process) once 300 s pass without a heartbeat
    watchdog_armed = [True]

    def _watchdog():
        while watchdog_armed[0]:
            time.sleep(10)
            if (watchdog_armed[0]
                    and time.time() - heartbeat[0] > stall_timeout_s):
                printer(f"  STALL: no sample finished in "
                        f"{stall_timeout_s:.0f}s — exiting for relaunch")
                sys.stdout.flush()
                _os._exit(42)

    if stall_timeout_s:
        threading.Thread(target=_watchdog, daemon=True).start()

    probe_args = None
    t0 = _now()
    for i in range(num_samples):
        image_np = rng.rand(H, W, 3).astype(np.float32)
        tl = rng.randint(6, text_len + 1)
        ids = np.zeros(text_len, np.int32)
        ids[:tl] = rng.randint(1, 30000, size=tl)
        mask = (np.arange(text_len) < tl).astype(np.int32)
        soft = np.zeros(3129, np.float32)
        soft[rng.randint(0, 3129)] = 1.0
        if i < start_i:
            continue  # RNG fast-forward: identical sample stream
        probe_args = (fparams, lparams, jnp.asarray(image_np),
                      jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(soft))
        tb = _now()
        accs = np.asarray(program_j(*probe_args))
        dt = _now() - tb
        heartbeat[0] = time.time()
        # the watchdog allows one compile per (re)launch
        if compile_s is None or (i == start_i and dt > 30):
            if compile_s is None:
                compile_s = dt
        else:
            per_sample_ms.append(dt * 1e3)
        accs_sum += accs
        if (i + 1) % 50 == 0:
            printer(f"  [{i + 1}/{num_samples}] lxmert samples "
                    f"({np.median(per_sample_ms):.0f} ms/sample)")
            sys.stdout.flush()
        if resume_path and (i + 1) % 100 == 0:
            with open(resume_path, "w") as f:
                json.dump({"i": i + 1,
                           "wall_s": prior_wall + (_now() - t0),
                           "accs_sum": accs_sum.tolist(),
                           "per_sample_ms": per_sample_ms[-2000:],
                           "compile_s": compile_s}, f)
    watchdog_armed[0] = False  # loop done: disarm before slow epilogue
    wall = prior_wall + (_now() - t0)
    if resume_path:
        try:
            _os.remove(resume_path)
        except OSError:
            pass
    curve = (accs_sum / max(num_samples, 1)).tolist()
    steady = float(np.median(per_sample_ms)) if per_sample_ms else None
    result = {
        "protocol": "lxmert_perturbation_frcnn_in_loop",
        "config": {"image_hw": list(image_hw), "text_len": text_len,
                   "layers": [lcfg.l_layers, lcfg.x_layers,
                              lcfg.r_layers],
                   "frcnn_stages": list(fcfg.stages),
                   "max_detections": M, "method": method,
                   "positive": positive, "num_samples": num_samples,
                   "seed": seed},
        "num_samples": num_samples,
        "wall_s": round(wall, 2),
        "resumed_at": start_i or None,
        "compile_s": round(compile_s, 2) if compile_s else None,
        "ms_per_sample_steady": round(steady, 1) if steady else None,
        "step_accuracies": [round(float(a), 6) for a in curve],
        "auc": round(float(pert.auc(np.asarray(curve), steps)), 6),
        "memory": _phase_memory(
            {"explain_plus_9step_program": (program_j, probe_args)}
            if probe_args is not None else {}),
    }
    if steady:
        result["eta_full_protocol_hours"] = round(
            full_protocol_samples * steady / 1e3 / 3600, 2)
    printer(f"lxmert pert (frcnn in loop): {num_samples} samples in "
            f"{wall:.1f}s ({result['ms_per_sample_steady']} ms/sample; "
            f"10k-sample protocol ≈ "
            f"{result.get('eta_full_protocol_hours')}h)")
    return result


# ---------------------------------------------------------------------------
# 3. DETR explanation-segmentation over COCO-shaped 800px images
# ---------------------------------------------------------------------------

def _synthetic_coco(tmpdir: str, num_images: int, hw=(480, 640),
                    seed: int = 0) -> str:
    """Write a synthetic COCO-val-shaped dataset: random images +
    rectangle-polygon instance annotations."""
    import os

    from PIL import Image

    rng = np.random.RandomState(seed)
    H, W = hw
    images, annotations = [], []
    ann_id = 1
    for i in range(1, num_images + 1):
        fname = f"synth_{i:06d}.png"
        arr = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(tmpdir, fname))
        images.append({"id": i, "file_name": fname,
                       "height": H, "width": W})
        for _ in range(rng.randint(2, 6)):
            x0 = float(rng.randint(0, W - 60))
            y0 = float(rng.randint(0, H - 60))
            w = float(rng.randint(30, min(200, W - x0)))
            h = float(rng.randint(30, min(200, H - y0)))
            annotations.append({
                "id": ann_id, "image_id": i,
                "category_id": int(rng.randint(1, 91)),
                "bbox": [x0, y0, w, h], "area": w * h, "iscrowd": 0,
                "segmentation": [[x0, y0, x0 + w, y0, x0 + w, y0 + h,
                                  x0, y0 + h]],
            })
            ann_id += 1
    path = os.path.join(tmpdir, "instances_synth.json")
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c, "name": str(c)}
                                  for c in range(1, 91)]}, f)
    return path


def rehearse_detr(
    num_images: int = 100,
    method: str = "ours_no_lrp",
    confidence_threshold: float = 0.02,
    max_queries_per_pass: int = 16,
    shortest: int = 800,
    source_hw=(480, 640),
    seed: int = 0,
    tmpdir: Optional[str] = None,
    printer=print,
) -> Dict:
    """Full DETR-R50 at the protocol's 800px (S ≈ 1050 encoder tokens
    after the 480×640 → 800×1333 val resize) over ≥100 COCO-shaped
    images: detect → per-query batched relevancy → Otsu masks →
    bilinear upsample → COCOeval with the lowered 0.2:0.95 IoU band
    (README.rst:116-145). Random weights spread softmax mass over the
    92 classes, so the rehearsal lowers the keep threshold (the real
    protocol's 0.5 keeps nothing at uniform logits) — every downstream
    shape/bucket matches the real run."""
    import tempfile

    import jax

    from transformer_mm_explainability_tpu.data.coco import CocoDetection
    from transformer_mm_explainability_tpu.harness import detr_eval, detr_segm
    from transformer_mm_explainability_tpu.models import detr as detr_model

    cfg = detr_model.DETR_R50
    params = detr_model.init_params(jax.random.PRNGKey(3), cfg)
    own_tmp = tmpdir is None
    if own_tmp:
        tmpdir = tempfile.mkdtemp(prefix="detr_rehearsal_")
    t0 = _now()
    ann = _synthetic_coco(tmpdir, num_images, hw=source_hw, seed=seed)
    dataset = CocoDetection(ann, image_root=tmpdir)
    data_s = _now() - t0

    segm_cfg = detr_segm.SegmConfig(
        confidence_threshold=confidence_threshold, method=method,
        max_queries_per_pass=max_queries_per_pass)
    times: List[float] = []
    orig_explain = detr_segm.explain_image

    def timed_explain(*a, **kw):
        tb = _now()
        out = orig_explain(*a, **kw)
        times.append(_now() - tb)
        if len(times) % 10 == 0:
            printer(f"  [{len(times)}/{num_images}] detr images "
                    f"(median {np.median(times) * 1e3:.0f} ms/img)")
        return out

    detr_segm.explain_image = timed_explain
    try:
        t1 = _now()
        stats = detr_eval.evaluate(
            params, dataset, cfg, segm_cfg, max_images=num_images,
            shortest=shortest,
            iou_thresholds=np.arange(0.2, 1.0, 0.05), printer=printer)
        wall = _now() - t1
    finally:
        detr_segm.explain_image = orig_explain
    per_img = np.asarray(times) * 1e3
    result = {
        "protocol": "detr_explanation_segmentation",
        "config": {"model": "detr_r50", "shortest": shortest,
                   "source_hw": list(source_hw),
                   "num_images": num_images, "method": method,
                   "confidence_threshold": confidence_threshold,
                   "max_queries_per_pass": max_queries_per_pass,
                   "iou_band": "0.2:0.95", "seed": seed},
        "num_images": num_images,
        "datagen_s": round(data_s, 2),
        "wall_s": round(wall, 2),
        "ms_per_image_first": round(float(per_img[0]), 1),
        "ms_per_image_steady": round(float(np.median(per_img[5:])), 1)
        if len(per_img) > 5 else None,
        "stats": {k: round(float(v), 5) for k, v in stats.items()},
        "memory": _phase_memory(dict(detr_segm.MEM_PROBE)),
    }
    printer(f"detr expl-segm: {num_images} images in {wall:.1f}s "
            f"(median {result['ms_per_image_steady']} ms/img steady); "
            f"mAP@[0.2:0.95]={stats['AP']:.4f}")
    return result


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def _prior_phases(path: str) -> Dict:
    """Phases already recorded in an existing artifact at `path`.

    A single phase can be (re)run without clobbering phases recorded by
    earlier invocations: a multi-hour all-protocol run may span
    sessions, and each phase's curves are too expensive to lose."""
    try:
        with open(path) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        return {}
    if not (isinstance(prior, dict)
            and prior.get("artifact") == "protocol_rehearsal"):
        return {}
    out = {}
    for k in ("visualbert", "lxmert", "detr"):
        if k not in prior:
            continue
        ph = prior[k]
        if isinstance(ph, dict) and "backend" not in ph:
            # phase recorded before per-phase provenance existed —
            # tag it explicitly rather than leaving the field absent
            ph = {**ph, "backend": "unknown", "devices": None}
        out[k] = ph
    return out


def _wall_s_total(results: Dict) -> float:
    """Sum of per-phase wall clocks across ALL merged phases (a later
    single-phase invocation must not overwrite the total with only its
    own wall — PROTOCOL_r04.json shipped 348 s next to a merged 2853 s
    phase)."""
    tot = 0.0
    for k in ("visualbert", "lxmert", "detr"):
        ph = results.get(k)
        if not isinstance(ph, dict):
            continue
        tot += float(ph.get("wall_s_total") or ph.get("wall_s") or 0.0)
        tot += float(ph.get("datagen_s") or 0.0)
    return round(tot, 2)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Protocol-scale rehearsal of the three quantitative "
                    "harnesses (synthetic weights/data, real shapes)")
    p.add_argument("--protocol", default="all",
                   choices=["all", "visualbert", "lxmert", "detr"])
    p.add_argument("--out", default=None, help="write JSON artifact here")
    p.add_argument("--vb-samples", type=int, default=10000)
    p.add_argument("--vb-batch", type=int, default=16)
    p.add_argument("--lx-samples", type=int, default=200)
    p.add_argument("--detr-images", type=int, default=100)
    p.add_argument("--method", default="ours_no_lrp")
    args = p.parse_args(argv)

    from transformer_mm_explainability_tpu.utils import tpu as tputil

    tputil.setup_compilation_cache()

    import jax

    results = {"artifact": "protocol_rehearsal",
               "devices": [str(d) for d in jax.devices()],
               "backend": jax.default_backend()}
    if args.out:
        results.update(_prior_phases(args.out))

    def checkpoint():
        # write after EVERY protocol: a multi-hour run must not lose
        # its finished sweeps to a tunnel disconnect in a later phase
        # (observed once: the chip connection dropped mid-DETR and the
        # completed VisualBERT+LXMERT curves died with the process)
        if args.out:
            results["wall_s_total"] = _wall_s_total(results)
            with open(args.out, "w") as f:
                f.write(json.dumps(results, indent=1) + "\n")

    # per-phase provenance: merged prior phases keep THEIR recorded
    # backend even when a later phase is re-run on a different one
    prov = {"backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()]}

    t0 = _now()
    if args.protocol in ("all", "visualbert"):
        results["visualbert"] = {**rehearse_visualbert(
            num_samples=args.vb_samples, batch_size=args.vb_batch,
            method=args.method), **prov}
        checkpoint()
    if args.protocol in ("all", "lxmert"):
        results["lxmert"] = {**rehearse_lxmert(
            num_samples=args.lx_samples, method=args.method,
            resume_path=(args.out + ".lxmert_resume.json"
                         if args.out else None)), **prov}
        checkpoint()
    if args.protocol in ("all", "detr"):
        results["detr"] = {**rehearse_detr(
            num_images=args.detr_images, method=args.method), **prov}
    results["wall_s_total"] = _wall_s_total(results)
    results["wall_s_last_invocation"] = round(_now() - t0, 2)
    out = json.dumps(results, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
