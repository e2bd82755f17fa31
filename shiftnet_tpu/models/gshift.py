"""GShiftNet — grouped spatial-temporal shift video restoration network.

One parameterized flax implementation spanning all four reference variants
(the reference keeps four ~800-line copy-pasted files:
``basicsr/models/archs/gshift_{deblur1,deblur2,denoise1,denoise2}.py``).

Input is a single clip, frames-as-batch NHWC ``(T, H, W, C_in)``; batch is
added via ``jax.vmap`` outside.  The forward predicts the ``T - past - future``
center frames with a global residual to the input (reference
``gshift_deblur1.py:783-791``).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from shiftnet_tpu.models.layers import (
    CAB, Conv2d, DownSample, EncoderShiftBlock, PReLU, PixelShufflePack,
    ShiftCAB, SkipUpSample, TFRUNet,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class GShiftNetConfig:
    """Static architecture configuration covering the 4 reference variants."""
    name: str = 'deblur_plus'
    in_channels: int = 3          # 4 for denoise (RGB + noise map)
    n_feats0: int = 24            # full-res width (14 small)
    n_feats2: int = 80            # Encoder2 width (64 small)
    num_orbs: int = 5             # TFR_UNets per stage0/stage2 (3 small)
    tfr_scale: int = 12           # TFR_UNet width increment per level (4 small)
    shift_rounds: int = 8         # GSTS rounds per shift block (4 small)
    encoder2_levels: int = 3      # U-Net depth of Encoder2 (2 small)
    encoder2_shift_encoder: bool = False   # small: shift blocks in encoder too
    encoder2_level0_shift_cabs: bool = False  # denoise+: Shift_CABs at full res
    encoder2_level1_shift_cabs: bool = False  # denoise+: Shift_CABs at level 1
    final_fuse_concat: bool = True  # concat+conv_hr0 (vs add, deblur-small)
    boundary_patch: bool = True     # patch boundary frames in temporal shift
    cab_mid_ca: bool = False        # denoise: extra CALayer2 after SimpleGate
    cab_last_bias: bool = False     # denoise: biased final 1x1 in CAB1/CAB2
    ca_reduction: int = 4           # 1 for deblur-small (hardcoded in ref)
    repconv_depthwise: bool = False  # small: fully-depthwise RepConv
    downsample_prelu: bool = False   # denoise: DownSample bias=False + PReLU
    stage_residual: bool = True      # deblur: stage0/stage2 shortcuts
    stage2_uses_conv_trans: bool = False  # denoise: stage2 gets sam_features
    rconcat_bias: bool = True
    rconcat_act: bool = False       # denoise: PReLU after rconcat
    conv_last_ks: int = 5           # 3 for denoise
    past_frames: int = 1            # num_fb (0 denoise train, 2 deblur test)
    future_frames: int = 1          # num_ff
    fused_tfr: bool = False         # packed-CHW Pallas TFR U-Nets (inference)
    fused_chw: bool = False         # whole-network packed-CHW path (infer.)
    stage2_chunk: int = 0           # fused path: stage2 is strictly
    # per-frame, so it CAN run as a lax.scan over frame chunks of this
    # many frames — its concat/orb temporaries then scale with the chunk,
    # not the window.  Default OFF: at bench scale (T<=40 720p) chunking
    # MEASURED +2.7 GB program requirement (probe_envelope r5: the full-T
    # x0/feats/dec inputs stay live through the whole scan, while
    # unchunked they die at the stage2 entry conv).  Opt in only for
    # windows past the single-window envelope (T>=48 720p).
    conv_concat: bool = False       # fused path: fold concat+conv into one
    # multi-input Pallas kernel (chw.conv_concat_chw).  Default OFF:
    # measured +4.7 GB program requirement at T=40 720p vs the plain
    # concat_chw + conv (probe_envelope r5 A-B — buffer assignment keeps
    # every kernel operand AND the un-aliasable pallas output live, where
    # XLA frees the concat inputs at the concat).  The kernel remains for
    # long-window configs where the 3*nf0 concat itself dominates.
    time_axis: str | None = None    # mesh axis name when the frame axis is
    # shard_map-sharded (exact sequence parallelism: per-round one-frame
    # ppermute halo exchange inside the temporal shifts; see ops/shift.py
    # and ops/naf_chw.temporal_shift_chw(axis=...) for the packed path).
    # Requires past_frames = future_frames = 0 (mask the loss instead of
    # slicing the globally-indexed center frames).  Works with both the
    # unfused and the fused (packed-CHW Pallas) forward.

    @property
    def noise_map(self) -> bool:
        return self.in_channels == 4

    def replace(self, **kw) -> 'GShiftNetConfig':
        return dataclasses.replace(self, **kw)


DEBLUR_PLUS = GShiftNetConfig(name='deblur_plus')
DEBLUR_SMALL = GShiftNetConfig(
    name='deblur_small', n_feats0=14, n_feats2=64, num_orbs=3, tfr_scale=4,
    shift_rounds=4, encoder2_levels=2, encoder2_shift_encoder=True,
    final_fuse_concat=False, boundary_patch=False, ca_reduction=1,
    repconv_depthwise=True)
DENOISE_PLUS = GShiftNetConfig(
    name='denoise_plus', in_channels=4, encoder2_level0_shift_cabs=True,
    encoder2_level1_shift_cabs=True, cab_mid_ca=True, cab_last_bias=True,
    downsample_prelu=True, stage_residual=False, stage2_uses_conv_trans=True,
    rconcat_bias=False, rconcat_act=True, conv_last_ks=3,
    past_frames=0, future_frames=0)
DENOISE_SMALL = GShiftNetConfig(
    name='denoise_small', in_channels=4, n_feats0=14, n_feats2=64, num_orbs=3,
    tfr_scale=4, shift_rounds=4, encoder2_levels=2,
    encoder2_shift_encoder=True, cab_mid_ca=True, cab_last_bias=True,
    downsample_prelu=True, repconv_depthwise=True, stage_residual=False,
    stage2_uses_conv_trans=True, rconcat_bias=False, rconcat_act=True,
    conv_last_ks=3, past_frames=0, future_frames=0)

CONFIGS = {c.name: c for c in
           (DEBLUR_PLUS, DEBLUR_SMALL, DENOISE_PLUS, DENOISE_SMALL)}


class Encoder2(nn.Module):
    """The temporal-fusion U-Net (``gshift_deblur1.py:548-642``, small variant
    ``gshift_deblur2.py:531-614``, denoise variant
    ``gshift_denoise1.py:573-670``)."""
    cfg: GShiftNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from shiftnet_tpu.ops import chw, chw_grad
        cfg = self.cfg
        nf = cfg.n_feats2
        nf0 = cfg.n_feats0
        red = cfg.ca_reduction
        chw_in = isinstance(x, chw.ChwTensor)
        cab_kw = dict(kernel_size=3, reduction=red, dtype=self.dtype)
        shift_kw = dict(
            rounds=cfg.shift_rounds, reduction=red,
            boundary_patch=cfg.boundary_patch, mid_ca=cfg.cab_mid_ca,
            last_bias=cfg.cab_last_bias,
            repconv_depthwise=cfg.repconv_depthwise,
            time_axis=cfg.time_axis,
            dtype=self.dtype)
        scab_kw = dict(time_axis=cfg.time_axis, **cab_kw)

        x = CAB(nf0, name='concat', **cab_kw)(x)
        shortcut = x
        if cfg.encoder2_level0_shift_cabs:
            x = ShiftCAB(nf0, name='encoder_level0', **scab_kw)(x)
            x = ShiftCAB(nf0, reverse=True, name='encoder_level0_1',
                         **scab_kw)(x)
        if chw_in:
            # down01 (k=2 s=2 conv + PReLU) via the generic packed conv.
            z = jnp.zeros((1, 2, 2, x.c), self.dtype)
            r = Conv2d(nf, 2, stride=2, padding=0, use_bias=False,
                       dtype=self.dtype, name='down01__0')(z)
            PReLU(dtype=self.dtype, name='down01__1')(r)
            v = self.variables['params']
            x = chw_grad.conv_chw_d(
                x, jnp.asarray(v['down01__0']['conv']['kernel'], self.dtype),
                None, jnp.asarray(v['down01__1']['weight'], self.dtype),
                stride=2)
        else:
            x = Conv2d(nf, 2, stride=2, padding=0, use_bias=False,
                       dtype=self.dtype, name='down01__0')(x)
            x = PReLU(dtype=self.dtype, name='down01__1')(x)

        if cfg.encoder2_shift_encoder:
            # Small variants: 3 shift blocks per encoder level, 2 levels.
            enc1 = EncoderShiftBlock(nf, name='encoder_level1', **shift_kw)(x)
            enc11 = EncoderShiftBlock(nf, name='encoder_level1_1', **shift_kw)(enc1)
            enc11 = EncoderShiftBlock(nf, name='encoder_level1_2', **shift_kw)(enc11)
            y = DownSample(nf, with_prelu=cfg.downsample_prelu,
                           dtype=self.dtype, name='down12')(enc11)
            enc2 = EncoderShiftBlock(nf, name='encoder_level2', **shift_kw)(y)
            enc22 = EncoderShiftBlock(nf, name='encoder_level2_1', **shift_kw)(enc2)
            enc22 = EncoderShiftBlock(nf, name='encoder_level2_2', **shift_kw)(enc22)

            dec2 = EncoderShiftBlock(nf, name='decoder_level2', **shift_kw)(enc22)
            dec22 = EncoderShiftBlock(nf, name='decoder_level2_1', **shift_kw)(dec2)
            dec22 = EncoderShiftBlock(nf, name='decoder_level2_2', **shift_kw)(dec22)
            skip1 = CAB(nf, name='skip_attn1', **cab_kw)(enc11)
            y = SkipUpSample(nf, dtype=self.dtype, name='up21')(dec22, skip1)
            dec1 = EncoderShiftBlock(nf, name='decoder_level1', **shift_kw)(y)
            dec11 = EncoderShiftBlock(nf, name='decoder_level1_1', **shift_kw)(dec1)
            dec11 = EncoderShiftBlock(nf, name='decoder_level1_2', **shift_kw)(dec11)
        else:
            # Big variants: plain-CAB (or Shift_CAB) encoder, 3 levels;
            # shift blocks only in the decoder.
            if cfg.encoder2_level1_shift_cabs:
                enc1 = ShiftCAB(nf, name='encoder_level1', **scab_kw)(x)
                enc11 = ShiftCAB(nf, reverse=True,
                                 name='encoder_level1_1', **scab_kw)(enc1)
            else:
                enc1 = CAB(nf, name='encoder_level1', **cab_kw)(x)
                enc11 = CAB(nf, name='encoder_level1_1', **cab_kw)(enc1)
            y = DownSample(nf, with_prelu=cfg.downsample_prelu,
                           dtype=self.dtype, name='down12')(enc11)
            enc2 = CAB(nf, name='encoder_level2', **cab_kw)(y)
            enc22 = CAB(nf, name='encoder_level2_1', **cab_kw)(enc2)
            # Level 3 runs as an XLA NHWC island: its extent (H/8, W/8) is
            # below the shared quarter grid, and the tensors are 16x smaller
            # than level 1 — conversion cost is negligible.
            e22 = chw.to_nhwc(enc22) if chw_in else enc22
            y = DownSample(nf, with_prelu=cfg.downsample_prelu,
                           dtype=self.dtype, name='down23')(e22)
            # SHIFTNET_L3_NHWC=1 restores the round-3 layout (L3 island on
            # NHWC + padr=4 decoder grids) — memory/perf A-B calibration
            # only (tools/probe_envelope.py).
            import os
            l3_nhwc = bool(os.environ.get('SHIFTNET_L3_NHWC'))
            if chw_in and not l3_nhwc:
                # Level 3 (H/8) is below the shared quarter grid, so it
                # gets its OWN packed grid (pf=1): the L3 CABs and shift
                # blocks were ~9% of the fused 720p forward on the XLA
                # NHWC path (~2.7x the packed per-pixel cost — 128-lane
                # padding at C=80 plus unfusable shift/LN glue).  Only the
                # stride-2 down23 and the bilinear up32 stay NHWC (one
                # conv each; cross-grid strides aren't representable).
                # padr=8 >= the flat layout's max spatial shift.
                y = chw.from_nhwc(y, padr=8, pf=1)
            enc3 = CAB(nf, name='encoder_level3', **cab_kw)(y)
            enc33 = CAB(nf, name='encoder_level3_1', **cab_kw)(enc3)

            dec3 = EncoderShiftBlock(nf, name='decoder_level3', **shift_kw)(enc33)
            dec33 = EncoderShiftBlock(nf, name='decoder_level3_1', **shift_kw)(dec3)
            skip2 = CAB(nf, name='skip_attn2', **cab_kw)(enc22)
            if chw_in:
                y = SkipUpSample(nf, dtype=self.dtype, name='up32')(
                    dec33 if l3_nhwc else chw.to_nhwc(dec33),
                    chw.to_nhwc(skip2))
                # padr=8 >= the flat layout's max shift (8 cells) so the
                # decoder_level2 blocks take the Pallas shift-round kernel
                # (shift_round_eligible); +4 pad rows is ~2% HBM at H/8.
                y = chw.from_nhwc(y, padr=4 if l3_nhwc else 8, pf=1)
            else:
                y = SkipUpSample(nf, dtype=self.dtype, name='up32')(dec33,
                                                                    skip2)
            dec2 = EncoderShiftBlock(nf, name='decoder_level2', **shift_kw)(y)
            dec22 = EncoderShiftBlock(nf, name='decoder_level2_1', **shift_kw)(dec2)
            skip1 = CAB(nf, name='skip_attn1', **cab_kw)(enc11)
            y = SkipUpSample(nf, dtype=self.dtype, name='up21')(dec22, skip1)
            dec1 = EncoderShiftBlock(nf, name='decoder_level1', **shift_kw)(y)
            dec11 = EncoderShiftBlock(nf, name='decoder_level1_1', **shift_kw)(dec1)
            dec11 = EncoderShiftBlock(nf, name='decoder_level1_2', **shift_kw)(dec11)

        up = PixelShufflePack(nf0, scale=2, upsample_kernel=3,
                              dtype=self.dtype, name='upsample0')(dec11)
        skip = CAB(nf0, name='skip_conv', **cab_kw)(shortcut)
        if chw_in:
            if cfg.final_fuse_concat:
                z = jnp.zeros((1, 1, 1, 2 * nf0), self.dtype)
                Conv2d(nf0, 3, use_bias=True, dtype=self.dtype,
                       name='conv_hr0')(z)
                p = self.variables['params']['conv_hr0']['conv']
                kc = jnp.asarray(p['kernel'], self.dtype)
                # conv(concat(up, skip)) as one multi-input kernel
                # (chw.conv_concat_chw; conv is linear in its input
                # channels): the 2*nf0-channel full-res packed concat
                # never materializes — its output (5.4 GB at T=52 720p)
                # + slice temp were the largest HLO temps of the whole
                # forward, and XLA can't fuse adds of separate
                # pallas_call outputs either.
                if cfg.conv_concat:
                    out = chw_grad.conv_concat_chw_d(
                        [up, skip], [kc[:, :, :nf0], kc[:, :, nf0:]],
                        jnp.asarray(p['bias'], self.dtype), None)
                else:
                    out = chw_grad.conv_chw_d(
                        chw.concat_chw([up, skip]), kc,
                        jnp.asarray(p['bias'], self.dtype), None)
            else:
                z = jnp.zeros((1, 1, 1, nf0), self.dtype)
                PReLU(dtype=self.dtype, name='act')(z)
                Conv2d(nf0, 3, use_bias=False, dtype=self.dtype,
                       name='conv_hr0')(z)
                v = self.variables['params']
                a = jnp.asarray(v['act']['weight']).astype(self.dtype)
                upa = chw.ChwTensor(
                    jnp.maximum(up.data, 0) + a * jnp.minimum(up.data, 0),
                    up.h, up.w, up.padr, up.pf, up.c)
                out = chw.add_chw(
                    chw_grad.conv_chw_d(upa, jnp.asarray(
                        v['conv_hr0']['conv']['kernel'], self.dtype),
                        None, None), skip)
        elif cfg.final_fuse_concat:
            out = Conv2d(nf0, 3, use_bias=True, dtype=self.dtype,
                         name='conv_hr0')(jnp.concatenate([up, skip], axis=-1))
        else:
            up = PReLU(dtype=self.dtype, name='act')(up)
            out = Conv2d(nf0, 3, use_bias=False, dtype=self.dtype,
                         name='conv_hr0')(up) + skip
        out = CAB(nf0, name='out_conv', **cab_kw)(out)
        return out


class GShiftNet(nn.Module):
    """Full three-stage network (``gshift_deblur1.py:726-791``)."""
    cfg: GShiftNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, noise_map=None):
        cfg = self.cfg
        nf0 = cfg.n_feats0
        t = x.shape[0]
        fb, ff = cfg.past_frames, cfg.future_frames
        center = slice(fb, t - ff)
        tfr_kw = dict(kernel_size=3, reduction=cfg.ca_reduction,
                      scale_unetfeats=cfg.tfr_scale,
                      downsample_prelu=cfg.downsample_prelu, dtype=self.dtype)

        shortcut = x
        inp = x
        if cfg.noise_map:
            assert noise_map is not None, 'denoise variants require a noise map'
            inp = jnp.concatenate([x, noise_map.astype(x.dtype)], axis=-1)

        if cfg.time_axis is not None:
            # Sharded frame axis: center slicing indexes GLOBAL frames, which
            # a shard-local slice can't express — predict all T frames and
            # mask the loss instead (train/step.py make_tsharded_train_step).
            assert fb == 0 and ff == 0, (
                'time-sharded models must use past_frames=future_frames=0; '
                'mask the loss over center frames instead')

        from shiftnet_tpu.ops import chw
        if cfg.fused_chw and chw.tfr_shapes_ok(x.shape[1], x.shape[2]):
            # Works under a sharded frame axis too (time_axis set inside a
            # shard_map): every packed kernel is frame-local except the
            # temporal shifts, which route through the ppermute variant
            # (ops/naf_chw.temporal_shift_chw(axis=...)).
            return self._forward_chw(inp, shortcut, center, tfr_kw)

        x0 = Conv2d(nf0, 3, use_bias=True, dtype=self.dtype,
                    name='feat_extract__0')(inp)
        x0 = CAB(nf0, kernel_size=3, reduction=cfg.ca_reduction,
                 dtype=self.dtype, name='feat_extract__1')(x0)

        # stage0: per-frame TFR U-Nets (gshift_deblur1.py:762-770).  The
        # fused path converts to the packed CHW layout ONCE around the whole
        # orb chain (ops/chw.py docstring: why NHWC is 2.7-5.3x HBM-padded
        # at these widths).
        from shiftnet_tpu.ops import chw
        use_chw = cfg.fused_tfr and chw.tfr_shapes_ok(x.shape[1], x.shape[2])
        y = chw.from_nhwc(x0, padr=2, pf=4) if use_chw else x0
        y = self._orb_chain('orb', y, tfr_kw)
        if use_chw:
            y = chw.to_nhwc(y)
        sam_features0 = y + x0 if cfg.stage_residual else y
        sam_features = Conv2d(nf0, 3, use_bias=True, dtype=self.dtype,
                              name='conv_trans')(sam_features0)

        # stage1: temporal-fusion U-Net.
        decoder_outs = Encoder2(cfg, dtype=self.dtype, name='stage1')(sam_features)

        # stage2: refine the center frames (gshift_deblur1.py:771-781).
        stage2_feats = sam_features if cfg.stage2_uses_conv_trans else sam_features0
        z = jnp.concatenate(
            [x0[center], stage2_feats[center], decoder_outs[center]], axis=-1)
        z = Conv2d(nf0, 3, use_bias=cfg.rconcat_bias, dtype=self.dtype,
                   name='rconcat')(z)
        if cfg.rconcat_act:
            z = PReLU(dtype=self.dtype, name='lrelu')(z)
        shortcut2 = z
        if use_chw:
            z = chw.from_nhwc(z, padr=2, pf=4)
        z = self._orb_chain('rorb', z, tfr_kw)
        if use_chw:
            z = chw.to_nhwc(z)
        if cfg.stage_residual:
            z = z + shortcut2
        z = Conv2d(3, cfg.conv_last_ks, use_bias=False, dtype=self.dtype,
                   name='conv_last')(z)
        return z + shortcut[center]

    def _orb_chain(self, prefix, y, tfr_kw):
        """num_orbs sequential TFR U-Nets.  Init declares each orb's
        (torch-named) params by unrolled module calls; apply runs a
        ``lax.scan`` over the stacked per-orb param subtrees — the orbs are
        shape-identical, so the whole U-Net body (incl. its Pallas calls on
        the fused path) is traced/compiled once instead of num_orbs
        times."""
        cfg = self.cfg
        if self.is_initializing():
            for i in range(cfg.num_orbs):
                y = TFRUNet(cfg.n_feats0, name=f'{prefix}{i + 1}',
                            **tfr_kw)(y)
            return y
        return self._orb_fn(prefix, tfr_kw)(y)

    def _orb_fn(self, prefix, tfr_kw):
        """Pure applier for the orb chain (apply mode only): the stacked
        param read happens here, OUTSIDE any jax control flow, so the
        returned closure is safe to call inside ``lax.scan`` bodies (the
        stage2 frame-chunk loop)."""
        cfg = self.cfg
        v = self.variables['params']
        stacked = jax.tree.map(
            lambda *ls: jnp.stack(ls),
            *[v[f'{prefix}{i + 1}'] for i in range(cfg.num_orbs)])
        orb = TFRUNet(cfg.n_feats0, **tfr_kw)

        @jax.checkpoint
        def body(carry, prm):
            return orb.apply({'params': prm}, carry), None

        def run(y):
            y, _ = jax.lax.scan(body, y, stacked)
            return y

        return run

    def _forward_chw(self, inp, shortcut, center, tfr_kw):
        """Whole-network packed-CHW path: two layout conversions total
        (entry and exit); everything in between runs on ChwTensors (the L3
        island inside Encoder2 excepted)."""
        from shiftnet_tpu.ops import chw, chw_grad
        cfg = self.cfg
        nf0 = cfg.n_feats0
        dt = self.dtype

        def conv_params(name, c_in, k, bias):
            z = jnp.zeros((1, 1, 1, c_in), dt)
            Conv2d(nf0 if name != 'conv_last' else 3, k, use_bias=bias,
                   dtype=dt, name=name)(z)
            p = self.variables['params'][name]['conv']
            return (jnp.asarray(p['kernel'], dt),
                    jnp.asarray(p['bias'], dt) if bias else None)

        def tslice(ct, sl):
            return chw.ChwTensor(ct.data[sl], ct.h, ct.w, ct.padr, ct.pf,
                                 ct.c)

        # Cast to the compute dtype at entry (the unfused path's first
        # nn.Conv does this implicitly); otherwise an f32 training batch
        # would promote the whole fused interior to f32.
        xin = chw.from_nhwc(inp.astype(dt), padr=4, pf=4)
        k, b = conv_params('feat_extract__0', inp.shape[-1], 3, True)
        x0 = chw_grad.conv_chw_d(xin, k, b, None)
        x0 = CAB(nf0, kernel_size=3, reduction=cfg.ca_reduction, dtype=dt,
                 name='feat_extract__1')(x0)

        y = self._orb_chain('orb', x0, tfr_kw)
        sam0 = chw.add_chw(y, x0) if cfg.stage_residual else y
        k, b = conv_params('conv_trans', nf0, 3, True)
        sam = chw_grad.conv_chw_d(sam0, k, b, None)

        dec = Encoder2(cfg, dtype=dt, name='stage1')(sam)

        feats = sam if cfg.stage2_uses_conv_trans else sam0
        k, b = conv_params('rconcat', 3 * nf0, 3, cfg.rconcat_bias)
        alpha = None
        if cfg.rconcat_act:
            PReLU(dtype=dt, name='lrelu')(jnp.zeros((1, 1, 1, nf0), dt))
            alpha = jnp.asarray(
                self.variables['params']['lrelu']['weight'], dt)
        kl, _ = conv_params('conv_last', nf0, cfg.conv_last_ks, False)

        def stage2(x0c, featsc, decc, rorb):
            # conv(concat(a, b, c)): with cfg.conv_concat, one multi-input
            # kernel (the 3*nf0 packed concat never materializes — matters
            # only at very long windows); default is the plain concat +
            # conv, which buffer-assigns 4.7 GB smaller at T=40 720p
            # (see GShiftNetConfig.conv_concat).
            if cfg.conv_concat:
                z = chw_grad.conv_concat_chw_d(
                    [x0c, featsc, decc],
                    [k[:, :, :nf0], k[:, :, nf0:2 * nf0], k[:, :, 2 * nf0:]],
                    b, alpha)
            else:
                z = chw_grad.conv_chw_d(
                    chw.concat_chw([x0c, featsc, decc]), k, b, alpha)
            shortcut2 = z
            z = rorb(z)
            if cfg.stage_residual:
                z = chw.add_chw(z, shortcut2)
            return chw_grad.conv_chw_d(z, kl, None, None)

        fb = center.start
        t_c = center.stop - fb
        cs = _chunk_size(t_c, cfg.stage2_chunk)
        if self.is_initializing() or cs >= t_c:
            z = stage2(tslice(x0, center), tslice(feats, center),
                       tslice(dec, center),
                       lambda y: self._orb_chain('rorb', y, tfr_kw))
        else:
            # Stage2 has no temporal mixing (every op is per-frame), so a
            # scan over frame chunks is exact and caps its live HBM at
            # chunk scale.  dynamic_slice (not a materialized center
            # slice) keeps the full-T inputs read in place.
            rorb = self._orb_fn('rorb', tfr_kw)

            def chunk(ct, i):
                d = jax.lax.dynamic_slice(
                    ct.data, (fb + i * cs, 0, 0), (cs,) + ct.data.shape[1:])
                return chw.ChwTensor(d, ct.h, ct.w, ct.padr, ct.pf, ct.c)

            def body(_, i):
                zc = stage2(chunk(x0, i), chunk(feats, i), chunk(dec, i),
                            rorb)
                return None, zc.data

            _, od = jax.lax.scan(body, None, jnp.arange(t_c // cs))
            z = chw.ChwTensor(od.reshape((t_c,) + od.shape[2:]),
                              x0.h, x0.w, x0.padr, x0.pf, 3)
        return chw.to_nhwc(z) + shortcut[center]


def _chunk_size(t_c: int, pref: int) -> int:
    """Largest divisor of ``t_c`` that is <= the configured chunk size
    (<=0 disables chunking)."""
    if pref <= 0 or t_c <= pref:
        return t_c
    return next(cs for cs in range(pref, 0, -1) if t_c % cs == 0)


def build_model(name: str, *, dtype=jnp.float32, **overrides) -> GShiftNet:
    cfg = CONFIGS[name].replace(**overrides) if overrides else CONFIGS[name]
    return GShiftNet(cfg, dtype=dtype)
