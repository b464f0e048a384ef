#!/usr/bin/env python
"""On-chip NUFFT/gridder throughput: visibilities/s for type-1/2.

ES-kernel (ducc/FINUFFT family) NUFFT at radio-interferometry scale:
512² dirty image, 1e5-1e6 visibilities, W=8 (f32 regime).  Appends to
docs/perf_nufft.json.
"""

import json
import sys
import time

import os

import jax

if os.environ.get("NO_JAX_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nifty_tpu.ops.nufft import RadioResponse, nufft1, nufft2

OUT = "/root/repo/docs/perf_nufft.json"
records = []


def emit(rec):
    records.append(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "w") as f:
        json.dump(records, f, indent=1)


def timed(fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def run(shape, npts, width=8):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=shape), jnp.float32)
    # coords stays HOST numpy: closing a jit over a TPU-resident array
    # makes JAX pull it back for constant embedding, which died with
    # UNIMPLEMENTED on the axon backend; a numpy constant (or a runtime
    # argument, used for img/vis) avoids the transfer entirely.
    coords = rng.uniform(-shape[0] / 2, shape[0] / 2,
                         size=(npts, 2)).astype(np.float32)
    # complex host->device transfers are unimplemented on this runtime;
    # build the complex visibilities ON device from two real arrays
    vis = jax.jit(lambda a, b: a + 1j * b)(
        jnp.asarray(rng.normal(size=npts), jnp.float32),
        jnp.asarray(rng.normal(size=npts), jnp.float32),
    )

    rec = {"probe": "nufft_throughput", "shape": list(shape),
           "npts": npts, "width": width}

    def leg(label, fn):
        try:
            t = timed(fn)
            rec[f"{label}_s"] = t
            rec[f"{label}_vis_per_s"] = npts / t
        except Exception as e:
            rec[f"{label}_error"] = repr(e)[:160]

    f2 = jax.jit(lambda im: nufft2(im, coords, width=width))
    leg("type2", lambda: f2(img))
    f1 = jax.jit(lambda v: nufft1(shape, v, coords, width=width))
    leg("type1", lambda: f1(vis))

    # sorted-uv RadioResponse (the production path)
    rr = RadioResponse(shape, coords, width=width)
    fr = jax.jit(rr)
    leg("radio_response_sorted", lambda: fr(img))
    return rec


def main():
    for npts in (100_000, 1_000_000):
        emit(run((512, 512), npts))


if __name__ == "__main__":
    main()
