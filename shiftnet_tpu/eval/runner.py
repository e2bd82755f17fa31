"""End-to-end evaluation harness — the de-facto benchmark of the reference.

Mirrors ``inference/test_deblur{,_small}.py`` and ``test_denoise{,_small}.py``:
scan video folders, run windowed (deblur) or windowed+quadrant-tiled (denoise)
inference, score PSNR + reference-SSIM per frame, log per-video and total
averages to a text log.

TPU-native differences: NHWC bf16 forward under jit (fp16 GradScaler games are
unnecessary on TPU), one compiled executable per (T, H, W) shape with
bucketing to avoid recompiles, and device-side noise synthesis for denoise.
"""
from __future__ import annotations

import glob
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from shiftnet_tpu.data.video_dataset import _imread
from shiftnet_tpu.eval.window import (half_slices, mod_crop,
                                      plan_deblur_chunks,
                                      plan_denoise_chunks, quadrant_slices)
from shiftnet_tpu.models import CONFIGS, build_model
from shiftnet_tpu.utils.logging import get_logger


class EvalLogger:
    """Reference ``Traverse_Logger`` (``test_deblur.py:15-23``)."""

    def __init__(self, result_dir: str, filename: str):
        os.makedirs(result_dir, exist_ok=True)
        self.path = os.path.join(result_dir, filename)
        self.f = open(self.path, 'a')

    def write(self, msg: str):
        print(msg, flush=True)
        self.f.write(msg + '\n')
        self.f.flush()


class Evaluator:
    def __init__(self, variant: str, params, *, result_path: str = 'results',
                 halo: int = 2, bf16: bool | None = None,
                 save_images: bool = False, overrides: dict | None = None,
                 metrics: dict | None = None, tp: int = 1, tp_devices=None):
        if bf16 is None:
            # Precision protocol (decided on measured evidence, PERF.md
            # round-4/5): deblur defaults to bf16 — measured bf16-vs-f32
            # output drift 52.21 dB at full 720p scale, ~0.02 dB PSNR
            # impact at the 35.88 dB GoPro target.  BOTH denoise variants
            # default to f32: measured drift is 28.25 dB at sigma=10 —
            # error energy at the ~40 dB PSNR regime.  The reference runs
            # denoise_small in fp16 (``test_denoise_small.py:85``), but
            # fp16's 11-bit significand is 8x finer than bf16's 8-bit in
            # [0,1]; bf16 is NOT the same precision class, so f32 is the
            # parity-safe TPU default (``--bf16``-equivalent opt-in stays
            # via the constructor arg).  Deblur fp16 protocol
            # (``test_deblur.py:86``) maps to bf16 safely per the drift
            # measurement.
            bf16 = not CONFIGS[variant].noise_map
        overrides = dict(overrides or {})
        # Packed-CHW fused inference for BOTH precisions (round 5): with
        # the Mosaic scoped-VMEM limit raised (chw.vmem_limit_mb) the f32
        # kernels get real row tiles too — measured denoise_plus 480p f32:
        # 1.701 fps unfused -> 5.712 fps fused (tools/bench_denoise.py),
        # and the kernels are exact at matched dtype (PERF.md round-4
        # drift decomposition).  Falls back per-shape via
        # ops/chw.py tfr_shapes_ok.
        overrides.setdefault('fused_chw', True)
        cfg = CONFIGS[variant].replace(past_frames=halo, future_frames=halo,
                                       **overrides)
        self.cfg = cfg
        self.halo = halo
        self.save_images = save_images
        self.result_path = result_path
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        self.model = build_model(variant, dtype=dtype,
                                 past_frames=halo, future_frames=halo,
                                 **overrides)
        self.params = params
        self.dtype = dtype
        # Configured metric set — reference ``val.metrics`` /
        # ``with_metrics`` loop (``image_restoration_model.py:392-425``);
        # default = the inference-local protocol the published numbers use
        # (skimage PSNR + scipy-gaussian SSIM, ``test_deblur.py:25-49``).
        self.metrics = dict(metrics) if metrics else {
            'psnr': {'type': 'psnr'}, 'ssim': {'type': 'ssim'}}
        # Single-chip HBM budgeting (eval/budget.py — replaces the round-4
        # hand constant that OOM'd the bench when the layout changed): the
        # full-vs-tiled window decision is made by XLA's own compile-time
        # memory analysis against ``hbm_budget()`` whenever the TPU is the
        # default backend; ``px_envelope`` is only the analytic pre-filter
        # that avoids compiling hopeless shapes (and the sole decider on
        # CPU runs).  A runtime RESOURCE_EXHAUSTED catch in
        # ``forward_window`` is the last-resort fallback.
        from shiftnet_tpu.eval.budget import (memory_gate_available,
                                              px_prefilter)
        self.px_envelope = px_prefilter(
            cfg.n_feats0, cfg.n_feats2, f32=dtype == jnp.float32,
            fused=cfg.fused_chw)
        self._memory_gate = memory_gate_available()
        # Temporal (sequence) parallelism: tp > 1 shards each window's frame
        # axis over a ('time',) mesh (parallel/temporal.py, ppermute halo
        # exchange).  Edge-halo caveat: interior shard boundaries see exactly
        # ``halo`` frames of context — equal to the reference's windowed
        # inference with window = T/tp, not to the monolithic forward.
        self.tp = int(tp)
        self._tp_mesh = None
        if self.tp > 1:
            from shiftnet_tpu.parallel.mesh import make_mesh
            devs = (tp_devices if tp_devices is not None
                    else jax.devices()[:self.tp])
            assert len(devs) >= self.tp, (
                f'tp={self.tp} needs {self.tp} devices, have {len(devs)}')
            self._tp_mesh = make_mesh(devices=devs[:self.tp], time=self.tp)
        self._jit_cache: dict[tuple, Any] = {}
        stamp = time.strftime('%Y-%m-%d %H:%M:%S')
        self.logger = EvalLogger(result_path, f'inference_log_{stamp}.txt')

    def _forward(self, shape: tuple) -> Any:
        if shape not in self._jit_cache:
            if self.cfg.noise_map:
                fn = jax.jit(lambda p, x, nm: self.model.apply(
                    {'params': p}, x, nm))
            else:
                fn = jax.jit(lambda p, x: self.model.apply({'params': p}, x))
            self._jit_cache[shape] = fn
        return self._jit_cache[shape]

    def forward_grids(self, x, sigma: float | None = None, *,
                      crop_size: int = 256, trans_num: int = 1) -> np.ndarray:
        """Overlap-averaged crop tiling with rot/flip TTA — the reference's
        validation protocol (``image_restoration_model.py:161-252``:
        ``grids`` -> per-crop forward -> ``grids_inverse``).

        x: (T, H, W, 3) clip in [0,1]; returns (T - 2*halo, H, W, 3) f32.
        """
        from shiftnet_tpu.eval.grids import (extract_grids, merge_grids,
                                             plan_grids)
        x = np.asarray(x, np.float32)
        t, h, w, _ = x.shape
        cs = min(crop_size, h, w)
        plans = plan_grids(h, w, cs, trans_num)
        preds = []
        for part in extract_grids(x, plans, cs):
            xt = jnp.asarray(np.ascontiguousarray(part), self.dtype)
            if self.cfg.noise_map:
                assert sigma is not None, 'denoise grids needs sigma'
                nm = jnp.full(xt.shape[:3] + (1,), sigma, self.dtype)
                o = self._forward(xt.shape)(self.params, xt, nm)
            else:
                o = self._forward(xt.shape)(self.params, xt)
            preds.append(np.asarray(o.astype(jnp.float32)))
        out_shape = (t - 2 * self.halo, h, w, 3)
        return merge_grids(preds, plans, out_shape, cs)

    def forward_window(self, x, sigma: float | None = None) -> np.ndarray:
        """Forward one (T, H, W, C) input window -> (T - 2*halo, H, W, 3)
        f32; splits into half-height tiles only when the window exceeds
        the active path's HBM envelope (``px_envelope``) — the reference
        quadrant-tiling analog (``test_denoise.py:153-173``).  Denoise
        variants pass ``sigma`` (the constant noise map is built per tile).
        This is the exact forward ``bench.py`` scores."""
        assert (sigma is not None) == self.cfg.noise_map, (
            'sigma required iff the variant takes a noise map')
        tt, hh, ww, _ = x.shape

        def run(xt):
            if self.tp > 1:
                o = self._run_tp(xt, sigma)
            elif self.cfg.noise_map:
                nm = jnp.full(xt.shape[:3] + (1,), sigma, self.dtype)
                o = self._forward(xt.shape)(self.params, xt, nm)
            else:
                o = self._forward(xt.shape)(self.params, xt)
            return np.asarray(o.astype(jnp.float32))

        # Window plan, strongest signal first (eval/budget.py):
        # 1. analytic pre-filter (px_envelope; 1.5x slop when the compile-
        #    time gate will make the real decision),
        # 2. XLA memory analysis of the AOT-compiled full window vs budget,
        # 3. runtime RESOURCE_EXHAUSTED -> shrink the envelope, tile.
        px = tt * hh * ww
        gate = self._memory_gate and self.tp == 1
        want_full = px <= int(self.px_envelope * (1.5 if gate else 1.0))
        if want_full and gate:
            from shiftnet_tpu.eval.budget import hbm_budget
            total = self._window_program_bytes(x.shape)
            if total > hbm_budget():
                self.logger.write(
                    f'[budget] full window {x.shape}: program '
                    f'{total / 1e9:.2f} GB > budget '
                    f'{hbm_budget() / 1e9:.2f} GB -> half-height tiles')
                want_full = False
        if want_full:
            try:
                return run(jnp.asarray(x, self.dtype))
            except Exception as e:  # runtime OOM only; re-raise the rest
                if 'RESOURCE_EXHAUSTED' not in str(e):
                    raise
                self.px_envelope = min(self.px_envelope, px - 1)
                self.logger.write(
                    f'[budget] runtime OOM at full window {x.shape} -> '
                    'falling back to half-height tiles '
                    f'(envelope shrunk to {self.px_envelope} px)')

        out = np.zeros((tt - 2 * self.halo, hh, ww, 3), np.float32)
        for in_sl, crop_sl, out_sl in half_slices(hh, ww):
            xt = jnp.asarray(x[:, in_sl[0], in_sl[1]], self.dtype)
            o = run(xt)
            out[:, out_sl[0], out_sl[1]] = o[:, crop_sl[0], crop_sl[1]]
        return out

    def _window_program_bytes(self, shape: tuple) -> int:
        """AOT-compile the full-window forward and return XLA's program
        requirement (temp + args + out — buffer assignment's own view,
        fragmentation included).  The compiled executable replaces the jit
        entry for this shape so the subsequent run dispatches it directly
        (no second compile)."""
        key = ('prog_bytes', shape)
        if key in self._jit_cache:
            return self._jit_cache[key]
        from shiftnet_tpu.eval.budget import compiled_total_bytes
        fn = self._forward(shape)

        def sds(a):
            return jax.ShapeDtypeStruct(a.shape, a.dtype)

        pspec = jax.tree.map(sds, self.params)
        xspec = jax.ShapeDtypeStruct(shape, self.dtype)
        if self.cfg.noise_map:
            nmspec = jax.ShapeDtypeStruct(shape[:3] + (1,), self.dtype)
            compiled = fn.lower(pspec, xspec, nmspec).compile()
        else:
            compiled = fn.lower(pspec, xspec).compile()
        total = compiled_total_bytes(compiled)
        self._jit_cache[shape] = compiled
        self._jit_cache[key] = total
        return total

    def _run_tp(self, xt, sigma: float | None):
        """Sequence-parallel window forward (both tasks).  The window's T
        frames shard over the tp mesh; when T doesn't divide tp the tail is
        padded by replicating the last frame (logged, never silent — the pad
        frames only ever serve as clamp-replicate context, the same edge
        semantics the boundary shards already use) and the pad outputs are
        dropped."""
        tt = xt.shape[0]
        pad = -tt % self.tp
        if pad:
            self.logger.write(
                f'[tp] window T={tt} % tp={self.tp} != 0: replicating the '
                f'last frame x{pad} (outputs for pad frames are dropped)')
            xt = jnp.concatenate([xt, jnp.repeat(xt[-1:], pad, axis=0)], 0)
        if self.cfg.noise_map:
            nm = jnp.full(xt.shape[:3] + (1,), sigma, self.dtype)
            o = self._forward_tp(xt.shape, with_nm=True)(self.params, xt, nm)
        else:
            o = self._forward_tp(xt.shape)(self.params, xt)
        return o[self.halo:tt - self.halo]

    def _forward_tp(self, shape: tuple, *, with_nm: bool = False) -> Any:
        """Frame-axis-sharded forward over the tp mesh: the window's T frames
        are split over ``tp`` devices with ppermute'd 2-frame halos
        (``parallel/temporal.py``); returns ALL T frames (the outer caller
        drops the global-edge halo frames)."""
        key = ('tp', shape, with_nm)
        if key not in self._jit_cache:
            from shiftnet_tpu.parallel.temporal import temporal_parallel_forward

            if with_nm:
                def apply_fn(params, clip, nm):
                    return self.model.apply({'params': params}, clip, nm)
            else:
                def apply_fn(params, clip):
                    return self.model.apply({'params': params}, clip)

            fn = temporal_parallel_forward(apply_fn, self._tp_mesh,
                                           halo=self.halo)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # -- deblur ------------------------------------------------------------
    def eval_deblur(self, data_path: str, one_len: int = 48, *,
                    grids: bool = False, crop_size: int = 256,
                    trans_num: int = 1) -> dict:
        """Protocol of ``test_deblur.py:91-177``; returns summary metrics.
        ``grids=True`` switches the per-chunk forward to the reference's
        validation tiling + TTA (``forward_grids``)."""
        input_root = os.path.join(data_path, 'blur')
        gt_root = os.path.join(data_path, 'gt')
        videos = sorted(os.listdir(input_root))
        totals: dict[str, dict[str, list]] = {}
        for v in videos:
            in_frames = sorted(glob.glob(os.path.join(input_root, v, '*')))
            gt_frames = sorted(glob.glob(os.path.join(gt_root, v, '*')))
            vsc = {name: [] for name in self.metrics}
            for ch in plan_deblur_chunks(len(in_frames), one_len, self.halo):
                t0 = time.time()
                inp = np.stack([_imread(p) for p in in_frames[ch.in_start:ch.in_stop]])
                gts = [_imread(p) for p in gt_frames[ch.out_start:ch.out_stop]]
                inp = mod_crop(inp, 4)
                gts = [mod_crop(g, 4) for g in gts]
                x = jnp.asarray(inp, self.dtype) / 255.0
                t1 = time.time()
                if grids:
                    out = self.forward_grids(x, crop_size=crop_size,
                                             trans_num=trans_num)
                else:
                    out = self.forward_window(x)
                t2 = time.time()
                sc = self._score(out, gts, v, ch.out_start)
                for name in vsc:
                    vsc[name] += sc[name]
                t3 = time.time()
                self.logger.write(
                    f'> {v}-{ch.in_start:05d} '
                    + self._fmt_last(sc)
                    + f' pre:{t1 - t0:.3f}s '
                    f'fwd:{t2 - t1:.3f}s post:{t3 - t2:.3f}s')
            totals[v] = vsc
        return self._summarize(totals)

    # -- denoise -----------------------------------------------------------
    def eval_denoise(self, data_path: str, sigma: float, *,
                     tile: bool = False, seed: int = 0, grids: bool = False,
                     crop_size: int = 256, trans_num: int = 1) -> dict:
        """Protocol of ``test_denoise.py:91-224``: GT-only videos, gaussian
        noise at fixed sigma, PSNR/SSIM vs GT.  The default forward is the
        envelope-driven ``forward_window`` (full frame when it fits — the
        same win that carried deblur past quadrant tiling); ``tile=True``
        forces the reference's fixed 4-quadrant tiling
        (``test_denoise.py:153-173``) for protocol-parity runs."""
        gt_root = data_path
        videos = sorted(os.listdir(gt_root))
        rng = np.random.default_rng(seed)
        s = sigma / 255.0
        totals: dict[str, dict[str, list]] = {}
        for v in videos:
            frames = sorted(glob.glob(os.path.join(gt_root, v, '*')))
            vsc = {name: [] for name in self.metrics}
            for ch in plan_denoise_chunks(len(frames), self.halo):
                t0 = time.time()
                gt_clip = np.stack([_imread(p) for p in frames[ch.in_start:ch.in_stop]])
                gt_clip = mod_crop(gt_clip, 4)
                clean = gt_clip.astype(np.float32) / 255.0
                noisy = clean + rng.normal(0, s, clean.shape).astype(np.float32)
                t, h, w, _ = noisy.shape
                t1 = time.time()
                if grids:
                    out = self.forward_grids(noisy, s, crop_size=crop_size,
                                             trans_num=trans_num)
                elif tile:
                    out = np.zeros((t - 2 * self.halo, h, w, 3), np.float32)
                    for in_sl, crop_sl, out_sl in quadrant_slices(h, w):
                        xt = jnp.asarray(
                            noisy[:, in_sl[0], in_sl[1]], self.dtype)
                        nm = jnp.full(xt.shape[:3] + (1,), s, self.dtype)
                        o = self._forward(xt.shape)(self.params, xt, nm)
                        o = np.asarray(o.astype(jnp.float32))
                        out[:, out_sl[0], out_sl[1]] = o[:, crop_sl[0], crop_sl[1]]
                else:
                    out = self.forward_window(
                        jnp.asarray(noisy, self.dtype), s)
                t2 = time.time()
                gts = [g for g in gt_clip[self.halo:gt_clip.shape[0] - self.halo]]
                sc = self._score(out, gts, v, ch.out_start)
                for name in vsc:
                    vsc[name] += sc[name]
                t3 = time.time()
                self.logger.write(
                    f'> {v}-{ch.in_start:05d} '
                    + self._fmt_last(sc)
                    + f' pre:{t1 - t0:.3f}s '
                    f'fwd:{t2 - t1:.3f}s post:{t3 - t2:.3f}s')
            totals[v] = vsc
        return self._summarize(totals, per_video_avg=True)

    # -- shared ------------------------------------------------------------
    def _score(self, out: np.ndarray, gts, video: str,
               index0: int) -> dict[str, list]:
        """Run every configured metric per frame (the reference's
        ``with_metrics`` loop, ``image_restoration_model.py:392-425``)."""
        from shiftnet_tpu.eval.registry import score_pair
        scores: dict[str, list] = {name: [] for name in self.metrics}
        for i, gt in enumerate(gts):
            img = np.clip(out[i], 0.0, 1.0) * 255.0
            for name, val in score_pair(img, gt, self.metrics).items():
                scores[name].append(val)
            if self.save_images:
                import imageio.v2 as imageio
                d = os.path.join(self.result_path, video)
                os.makedirs(d, exist_ok=True)
                imageio.imwrite(os.path.join(d, f'{index0 + i:03d}.png'),
                                img.astype(np.uint8))
        return scores

    @staticmethod
    def _fmt_last(sc: dict[str, list]) -> str:
        return ', '.join(f'{name.upper()}={vals[-1]:.5g}'
                         for name, vals in sc.items() if vals)

    def _summarize(self, totals: dict[str, dict[str, list]],
                   per_video_avg: bool = False):
        names = list(self.metrics)
        sums = {n: 0.0 for n in names}
        vavg = {n: 0.0 for n in names}
        n_frames = 0
        for v, vsc in totals.items():
            avgs = {n: float(np.mean(vsc[n])) for n in names}
            self.logger.write(
                f'# Video:{v} ' + ', '.join(
                    f'AVG-{n.upper()}={avgs[n]:.5g}' for n in names))
            for n in names:
                sums[n] += sum(vsc[n])
                vavg[n] += avgs[n]
            n_frames += len(vsc[names[0]])
        res: dict[str, Any] = {n: sums[n] / n_frames for n in names}
        res['n_frames'] = n_frames
        self.logger.write('# Total ' + ', '.join(
            f'AVG-{n.upper()}={res[n]:.5g}' for n in names))
        if per_video_avg:
            nv = len(totals)
            for n in names:
                res[f'{n}_video_avg'] = vavg[n] / nv
            self.logger.write('# Total ' + ', '.join(
                f"AVG-{n.upper()}={res[f'{n}_video_avg']:.5g}" for n in names))
        return res
