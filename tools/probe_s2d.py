"""CPU-interpret correctness checks for the packed (s2d) CHW kernels."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
import jax  # noqa: E402

jax.config.update('jax_default_device', jax.devices('cpu')[0])
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from shiftnet_tpu.models.layers import (  # noqa: E402
    CAB, DownSample, SkipUpSample, TFRUNet)
from shiftnet_tpu.ops import chw  # noqa: E402


def err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.max(np.abs(a - b))
    return d, d / (np.max(np.abs(b)) + 1e-9)


def main():
    dt = jnp.float32
    key = jax.random.PRNGKey(0)

    # 1. roundtrip
    for pf, (t, h, w, c) in [(4, (2, 16, 96, 24)), (2, (2, 8, 24, 12)),
                             (4, (1, 16, 512, 8))]:
        x = jax.random.normal(key, (t, h, w, c), dt)
        rt = chw.to_nhwc(chw.from_nhwc(x, padr=2, pf=pf))
        print(f'roundtrip pf={pf} {x.shape}:', err(rt, x)[0])
        assert err(rt, x)[0] == 0

    # 2. packed CAB vs XLA CAB
    for pf, (t, h, w, c) in [(4, (2, 16, 96, 24)), (2, (2, 16, 96, 12)),
                             (4, (1, 16, 512, 8))]:
        mod = CAB(c, kernel_size=3, reduction=4, dtype=dt)
        x = jax.random.normal(key, (t, h, w, c), dt)
        params = mod.init(jax.random.PRNGKey(1), x)['params']
        ref = mod.apply({'params': params}, x)
        got = chw.to_nhwc(chw.cab_chw(chw.from_nhwc(x, padr=2, pf=pf),
                                      params, reduction=4, interpret=True))
        d, rel = err(got, ref)
        print(f'cab pf={pf} {x.shape}: abs {d:.2e} rel {rel:.2e}')
        assert rel < 1e-5, rel

    # 3. down vs DownSample (both variants)
    for prelu in (False, True):
        t, h, w, c, co = 2, 16, 96, 24, 36
        mod = DownSample(co, with_prelu=prelu, dtype=dt)
        x = jax.random.normal(key, (t, h, w, c), dt)
        params = mod.init(jax.random.PRNGKey(1), x)['params']
        ref = mod.apply({'params': params}, x)
        got = chw.to_nhwc(chw.down_chw(chw.from_nhwc(x, padr=2, pf=4),
                                       params, co, with_prelu=prelu,
                                       interpret=True))
        d, rel = err(got, ref)
        print(f'down prelu={prelu}: abs {d:.2e} rel {rel:.2e}')
        assert rel < 1e-5, rel

    # 4. up vs SkipUpSample
    for pf_in, (t, h, w, ci, co) in [(2, (2, 8, 48, 16, 12)),
                                     (1, (2, 8, 48, 16, 12))]:
        mod = SkipUpSample(co, dtype=dt)
        x = jax.random.normal(key, (t, h, w, ci), dt)
        skip = jax.random.normal(jax.random.PRNGKey(2), (t, 2 * h, 2 * w, co),
                                 dt)
        params = mod.init(jax.random.PRNGKey(1), x, skip)['params']
        ref = mod.apply({'params': params}, x, skip)
        got = chw.to_nhwc(chw.up_skip_chw(
            chw.from_nhwc(x, padr=2, pf=pf_in), params,
            chw.from_nhwc(skip, padr=2, pf=2 * pf_in), interpret=True))
        d, rel = err(got, ref)
        print(f'up pf={pf_in}: abs {d:.2e} rel {rel:.2e}')
        assert rel < 1e-5, rel

    # 5. full TFR U-Net
    for (t, h, w, c0, scale) in [(2, 16, 96, 8, 4)]:
        mod = TFRUNet(c0, kernel_size=3, reduction=4, scale_unetfeats=scale,
                      dtype=dt)
        x = jax.random.normal(key, (t, h, w, c0), dt)
        params = mod.init(jax.random.PRNGKey(1), x)['params']
        ref = mod.apply({'params': params}, x)
        got = chw.to_nhwc(chw.tfr_unet_chw(
            params, chw.from_nhwc(x, padr=2, pf=4), reduction=4,
            interpret=True))
        d, rel = err(got, ref)
        print(f'tfr {x.shape}: abs {d:.2e} rel {rel:.2e}')
        assert rel < 1e-5, rel

    print('ALL OK')


if __name__ == '__main__':
    main()
