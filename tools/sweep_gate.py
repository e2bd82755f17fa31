"""Sweep the gate/rep row-tile sizes on TPU at the 720p L1 shape.

Run: python tools/sweep_gate.py [gate|rep] [t]
Prints per-th timing (or the compile failure) for CAB1 and CAB2.
"""
import os
import subprocess
import sys

WORKER = r'''
import os, sys, time
sys.path.insert(0, '.')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from shiftnet_tpu.models.layers import CAB1, CAB2
from shiftnet_tpu.ops import chw, naf_chw

t = int(sys.argv[1]); stage = sys.argv[2]; which = sys.argv[3]
n, add_c = 80, 40
h, w, pf = 360, 640, 2
dt_ = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((t, h, w, n)), dt_)
xc = chw.from_nhwc(x, padr=4, pf=pf)
if which == 'cab2':
    mod = CAB2(n, add_c, kernel_size=5, reduction=4, dtype=dt_)
    p = jax.jit(mod.init)(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, 8, n + add_c), dt_))['params']
    naf = naf_chw.naf_params_from_tree(jax.tree.map(jnp.asarray, p),
                                       add_c=add_c)
    hwc = naf_chw.gsts_hw_chw(xc, add_c, add_c // 8, reverse=False)
    fn = jax.jit(lambda d, hd: jax.tree.leaves(naf_chw.naf_cab_chw(
        chw.ChwTensor(d, h, w, 4, pf, n),
        chw.ChwTensor(hd, h, w, 4, pf, add_c), naf,
        groups=n // 8, stage=stage, interpret=False))[0])
    args = (xc.data, hwc.data)
else:
    mod = CAB1(n, kernel_size=5, reduction=4, dtype=dt_)
    p = jax.jit(mod.init)(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, 8, n), dt_))['params']
    naf = naf_chw.naf_params_from_tree(jax.tree.map(jnp.asarray, p))
    fn = jax.jit(lambda d: jax.tree.leaves(naf_chw.naf_cab_chw(
        chw.ChwTensor(d, h, w, 4, pf, n), None, naf,
        groups=n // 8, stage=stage, interpret=False))[0])
    args = (xc.data,)

out = fn(*args)
float(jnp.sum(out[..., :1].astype(jnp.float32)))
iters = 8
t0 = time.perf_counter()
for _ in range(iters):
    out = fn(*args)
float(jnp.sum(out[..., :1].astype(jnp.float32)))
print(f'RESULT {(time.perf_counter() - t0) / iters * 1e3:.2f} ms')
'''


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else 'gate'
    t = sys.argv[2] if len(sys.argv) > 2 else '8'
    var = 'SHIFTNET_NAF_TH_GATE' if kind == 'gate' else 'SHIFTNET_NAF_TH_REP'
    stage = 'gate' if kind == 'gate' else 'rep'
    ths = tuple(int(v) for v in os.environ.get(
        'SWEEP_THS', '2,3,4,6,9,12').split(','))
    for which in ('cab1', 'cab2'):
        for th in ths:
            env = dict(os.environ)
            env[var] = str(th)
            r = subprocess.run(
                [sys.executable, '-c', WORKER, t, stage, which],
                capture_output=True, text=True, env=env, timeout=1800)
            line = [ln for ln in r.stdout.splitlines() if 'RESULT' in ln]
            if line:
                print(f'{which} {kind} th={th}: {line[0].split()[1]} ms')
            else:
                err = (r.stderr.strip().splitlines() or ['?'])[-1]
                print(f'{which} {kind} th={th}: FAIL ({err[:120]})')


if __name__ == '__main__':
    main()
