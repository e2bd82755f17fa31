"""Device-side kernel breakdown of the fused 720p forward.

Captures a jax.profiler trace of one jitted forward and aggregates the
device-lane events by kernel name, printing a sorted table — the authority
for where e2e time actually goes (per-op wall timing through the relay
carries ~1-5 ms dispatch overhead per call; tools/probe_tfr.py showed the
sum of per-op timings exceeding the whole).

Run on TPU: python tools/profile_forward.py [t]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from shiftnet_tpu.models import build_model, init_params


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    h, w = 720, 1280
    dt_ = jnp.bfloat16
    model = build_model('deblur_plus', dtype=dt_, fused_chw=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (t, h, w, 3)), dt_)
    params = init_params(model, x[:3, :64, :64], seed=1)
    fwd = jax.jit(lambda p, v: model.apply({'params': p}, v))

    out = fwd(params, x)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))  # fence

    logdir = '/tmp/fwd_prof'
    os.system(f'rm -rf {logdir}')
    with jax.profiler.trace(logdir):
        out = fwd(params, x)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))

    files = glob.glob(f'{logdir}/**/*.trace.json.gz', recursive=True)
    if not files:
        print('no trace file found under', logdir)
        return
    with gzip.open(files[0], 'rt') as f:
        trace = json.load(f)

    # Identify device lanes (TPU core threads) vs host threads: device
    # events carry 'run_id'/'correlation' style args and pid names like
    # '/device:TPU:0' — fall back to aggregating everything with a dur.
    pid_names = {}
    for ev in trace['traceEvents']:
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            pid_names[ev['pid']] = ev['args'].get('name', '')
    dev_pids = {p for p, n in pid_names.items()
                if 'TPU' in n or 'device' in n.lower()}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in trace['traceEvents']:
        if ev.get('ph') != 'X' or 'dur' not in ev:
            continue
        if dev_pids and ev.get('pid') not in dev_pids:
            continue
        name = ev['name'].split('(')[0]
        agg[name] += ev['dur'] / 1e3  # us -> ms
        cnt[name] += 1
        total += ev['dur'] / 1e3

    print(f'--- device kernel totals (T={t}, one forward; {total:.1f} ms '
          f'summed over {len(agg)} distinct names) ---')
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f'{ms:9.2f} ms  x{cnt[name]:<5d} {name[:90]}')


if __name__ == '__main__':
    main()
