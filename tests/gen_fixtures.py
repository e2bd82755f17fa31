"""Generate golden parity fixtures by running the REFERENCE PyTorch code.

Run manually (not under pytest):  python tests/gen_fixtures.py

This script imports the reference implementation from /root/reference (read
only, generation time only — no reference code is copied into this repo),
fills its state_dict with deterministic per-key values, runs the forward on a
fixed input, and stores input + output (+ key metadata) as .npz fixtures.
Tests then rebuild the SAME weights from our flax tree via the converter and
compare outputs — an end-to-end structural + numerical parity check that needs
only numpy at test time.

Weight scheme (must match tests/test_model_parity.py):
  - conv 'weight' (4D): N(0, (0.3)^2/fan_in), fan_in = in/groups * kh * kw
    (the 0.3 keeps the ~230-CAB residual chain near-contractive: with unit
    scale the forward is chaotic — the reference's own fp32 output differs
    from its fp64 output by >2 sigma, making parity comparison meaningless)
  - conv 'bias': 0.01 * N(0,1)
  - LayerNorm2d 'weight': 1 + 0.1*N(0,1); 'bias': 0.1*N(0,1)
  - 'beta': 0.1*N(0,1)
  - PReLU 'weight' (shape (1,)): constant 0.3 (shared instances in the torch
    model make per-key random values ambiguous)
  - rng per key: np.random.default_rng(sha256(key)[:8])
"""
import hashlib
import sys
import types

import numpy as np

REF = '/root/reference'
FIXDIR = __file__.rsplit('/', 1)[0] + '/fixtures'


def key_rng(key: str) -> np.random.Generator:
    seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], 'little')
    return np.random.default_rng(seed)


def make_value(key: str, shape, fan_in=None) -> np.ndarray:
    rng = key_rng(key)
    shape = tuple(shape)
    if len(shape) == 4:  # conv weight OIHW
        assert fan_in is not None
        return (0.3 * rng.standard_normal(shape) / np.sqrt(fan_in)).astype(np.float32)
    if shape == (1,):  # PReLU
        return np.full(shape, 0.3, np.float32)
    if key.endswith('.beta'):
        return (0.1 * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith('.bias') and len(shape) == 1:
        # conv bias or LayerNorm bias — both small-random
        return (0.01 * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith('.weight') and len(shape) == 1:  # LayerNorm weight
        return (1.0 + 0.1 * rng.standard_normal(shape)).astype(np.float32)
    raise ValueError(f'unhandled param {key} {shape}')


def fill_state_dict(model) -> dict:
    import torch
    new = {}
    for key, v in model.state_dict().items():
        shape = tuple(v.shape)
        fan_in = None
        if len(shape) == 4:
            # find groups via the owning module
            mod = model
            for comp in key.split('.')[:-1]:
                mod = getattr(mod, comp) if not comp.isdigit() else mod[int(comp)]
            fan_in = shape[1] * shape[2] * shape[3]  # in/groups * kh * kw
        new[key] = torch.from_numpy(make_value(key, shape, fan_in))
    return new


def _load_arch(modname: str):
    """Load a reference arch file by path (the basicsr package __init__ pulls
    in torchvision, which isn't installed — the arch files themselves only
    need torch/numpy)."""
    import importlib.util
    path = f'{REF}/basicsr/models/archs/{modname}.py'
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import torch
    torch.set_num_threads(1)

    gshift_deblur1 = _load_arch('gshift_deblur1')
    gshift_deblur2 = _load_arch('gshift_deblur2')
    gshift_denoise1 = _load_arch('gshift_denoise1')
    gshift_denoise2 = _load_arch('gshift_denoise2')

    cases = [
        ('deblur_plus', gshift_deblur1, 3, 6, 64, 64, dict()),
        ('deblur_small', gshift_deblur2, 3, 6, 64, 64, dict()),
        ('denoise_plus', gshift_denoise1, 4, 5, 64, 64, dict()),
        ('denoise_small', gshift_denoise2, 4, 5, 64, 64, dict()),
    ]
    for name, mod, in_ch, t, h, w, kw in cases:
        torch.manual_seed(0)
        net = mod.GShiftNet(**kw)
        net.device = torch.device('cpu')
        state = fill_state_dict(net)
        missing, unexpected = net.load_state_dict(state, strict=True), None
        net.eval()

        rng = np.random.default_rng(1234)
        x = rng.uniform(0, 1, (1, t, 3, h, w)).astype(np.float32)
        args = [torch.from_numpy(x)]
        noise_map = None
        if in_ch == 4:
            noise_map = np.full((1, t, 1, h, w), 25.0 / 255.0, np.float32)
            args.append(torch.from_numpy(noise_map))
        with torch.no_grad():
            out = net(*args)
            net64 = net.double()
            args64 = [a.double() for a in args]
            out64 = net64(*args64)
        self_err = float((out.double() - out64).abs().max() / out64.std())
        keys = sorted(state.keys())
        np.savez_compressed(
            f'{FIXDIR}/model_{name}.npz',
            x=x, out=out64.float().numpy(), self_err=self_err,
            noise_map=noise_map if noise_map is not None else np.zeros(0),
            torch_keys=np.array('\n'.join(keys)),
        )
        print(f'{name}: out {tuple(out.shape)} '
              f'mean {out.mean():.6f} std {out.std():.6f} '
              f'self_err(fp32 vs fp64) {self_err:.2e} '
              f'({len(keys)} torch keys)')

    # --- op-level fixtures: shift semantics on raw tensors ---
    esb = gshift_deblur1.Encoder_shift_block(80, 5, 4)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 80, 24, 32)).astype(np.float32)  # (T,C,H,W)
    tx = torch.from_numpy(x)
    with torch.no_grad():
        fwd = esb.channel_shift(tx).numpy()
        rev = esb.channel_shift(tx, reverse=True).numpy()
        sp = esb.spatial_shift2(torch.from_numpy(
            rng.standard_normal((5, 40, 24, 32)).astype(np.float32)))
    # reproduce spatial input for saving
    rng2 = np.random.default_rng(7)
    _ = rng2.standard_normal((5, 80, 24, 32))
    sp_in = rng2.standard_normal((5, 40, 24, 32)).astype(np.float32)
    np.savez_compressed(f'{FIXDIR}/ops_shift_big.npz',
                        x=x, fwd=fwd, rev=rev, sp_in=sp_in, sp_out=sp.numpy())

    esb2 = gshift_deblur2.Encoder_shift_block(64, 5, 4)
    x2 = rng.standard_normal((4, 64, 16, 16)).astype(np.float32)
    tx2 = torch.from_numpy(x2)
    with torch.no_grad():
        fwd2 = esb2.channel_shift(tx2).numpy()
        rev2 = esb2.channel_shift(tx2, reverse=True).numpy()
    np.savez_compressed(f'{FIXDIR}/ops_shift_small.npz',
                        x=x2, fwd=fwd2, rev=rev2)

    # torch bilinear 2x upsample + pixel_shuffle goldens
    import torch.nn.functional as F
    up_in = rng.standard_normal((2, 7, 9, 11)).astype(np.float32)
    up_out = F.interpolate(torch.from_numpy(up_in), scale_factor=2,
                           mode='bilinear', align_corners=False).numpy()
    ps_in = rng.standard_normal((2, 12, 5, 6)).astype(np.float32)
    ps_out = F.pixel_shuffle(torch.from_numpy(ps_in), 2).numpy()
    np.savez_compressed(f'{FIXDIR}/ops_resize.npz',
                        up_in=up_in, up_out=up_out, ps_in=ps_in, ps_out=ps_out)
    print('op fixtures written')





def gen_metric_fixtures():
    """Goldens for color conversion + basicsr metrics, via the reference
    matlab_functions/psnr_ssim loaded standalone (stubbing package imports)."""
    import importlib.util
    import sys as _sys
    import types as _types

    def load_file(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        _sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mf = load_file('ref_matlab', f'{REF}/basicsr/utils/matlab_functions.py')
    # metric_util imports bgr2ycbcr from basicsr.utils.matlab_functions;
    # stub that package path to avoid the torchvision-laden __init__.
    pkg = _types.ModuleType('basicsr'); _sys.modules['basicsr'] = pkg
    upkg = _types.ModuleType('basicsr.utils'); _sys.modules['basicsr.utils'] = upkg
    _sys.modules['basicsr.utils.matlab_functions'] = mf
    mu = load_file('ref_metric_util', f'{REF}/basicsr/metrics/metric_util.py')
    mpkg = _types.ModuleType('basicsr.metrics'); _sys.modules['basicsr.metrics'] = mpkg
    _sys.modules['basicsr.metrics.metric_util'] = mu
    # skimage isn't installed; psnr_ssim imports it at module level but the
    # functions we exercise don't use it.
    sk = _types.ModuleType('skimage'); skm = _types.ModuleType('skimage.metrics')
    sk.metrics = skm
    _sys.modules.setdefault('skimage', sk)
    _sys.modules.setdefault('skimage.metrics', skm)
    ps = load_file('ref_psnr_ssim', f'{REF}/basicsr/metrics/psnr_ssim.py')
    # run the reference's CUDA-only 3D-SSIM path on CPU
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 255, (48, 56, 3)).astype(np.float32)
    img2 = np.clip(img + rng.normal(0, 10, img.shape), 0, 255).astype(np.float32)
    import torch as _t
    res_in = (img[:37, :53] / 255.0).astype(np.float32)
    out = dict(
        img=img, img2=img2,
        resize_in=res_in,
        resize_half=mf.imresize(_t.from_numpy(res_in).permute(2, 0, 1), 0.5,
                                True).permute(1, 2, 0).numpy(),
        resize_2x=mf.imresize(_t.from_numpy(res_in).permute(2, 0, 1), 2.0,
                              True).permute(1, 2, 0).numpy(),
        rgb2y=mf.rgb2ycbcr(img / 255.0, y_only=True),
        rgb2ycbcr=mf.rgb2ycbcr(img / 255.0),
        bgr2y=mf.bgr2ycbcr(img / 255.0, y_only=True),
        psnr_cb4=ps.calculate_psnr(img, img2, crop_border=4),
        psnr_y=ps.calculate_psnr(img, img2, crop_border=0, test_y_channel=True),
        ssim_cb0=ps.calculate_ssim(img, img2, crop_border=0),
        ssim_y=ps.calculate_ssim(img, img2, crop_border=4, test_y_channel=True),
    )
    np.savez_compressed(f'{FIXDIR}/metrics_basicsr.npz', **out)
    print('metric fixtures written')


if __name__ == '__main__':
    import sys as _s
    if '--metrics-only' in _s.argv:
        gen_metric_fixtures()
    else:
        main()
        gen_metric_fixtures()
