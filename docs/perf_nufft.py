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
if os.path.exists(OUT):
    try:
        with open(OUT) as f:
            records = json.load(f)
    except Exception:
        records = []


def emit(rec):
    key = (rec.get("probe"), tuple(rec.get("shape", ())), rec.get("npts"))
    records[:] = [
        r for r in records
        if (r.get("probe"), tuple(r.get("shape", ())), r.get("npts")) != key
    ]
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

    # In-jit chained measurement with a data-dependent carry: repeated
    # identical host dispatches are deduplicated/cached by this runtime
    # (measured "14e9 vis/s"), so per-application time is estimated from
    # the difference of two scan lengths.
    def chain_pair(apply_pair, x0, k_lo=1, k_hi=8, reps=3, aux=None):
        # `aux` (e.g. a Model with multi-MB `consts`) rides as a jit
        # ARGUMENT: closing the jit over device-resident consts makes
        # the axon runtime pull them back for constant embedding
        # (UNIMPLEMENTED); as an argument they stay shared HBM buffers.
        def chain(k):
            def g(a, x):
                def body(c, _):
                    # renormalize the carry so iterated unnormalized
                    # pairs cannot overflow f32
                    c = apply_pair(a, c)
                    return c / jnp.maximum(jnp.abs(c).max(), 1e-20), ()
                y, _ = jax.lax.scan(body, x, None, length=k)
                return jnp.abs(y).max()
            return jax.jit(g)

        def t(fn):
            # fetch-forced, fresh inputs: block_until_ready alone and
            # repeated identical dispatches both mis-time on this
            # runtime; fetching a scalar derived from the result cannot
            # be faked (docs/perf.md header)
            xs = [x0 * (1.0 + 0.01 * (i + 1)) for i in range(reps + 1)]
            float(fn(aux, xs[0]))
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                float(fn(aux, xs[i + 1]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (t(chain(k_hi)) - t(chain(k_lo))) / (k_hi - k_lo)

    def leg(label, apply_pair, x0, aux=None):
        try:
            t = chain_pair(apply_pair, x0, aux=aux)
            rec[f"{label}_pair_s"] = t
            rec[f"{label}_pair_vis_per_s"] = npts / t
        except Exception as e:
            rec[f"{label}_error"] = repr(e)[:160]

    # type-2 + type-1 round trip (the degridder/gridder pair every
    # radio metric matvec applies).  Above _POINT_BATCH_MIN_ENTRIES
    # window entries nufft2 auto-batches the interpolation via lax.map
    # (the one-shot window scatter faults the worker at 6.4e7 entries).
    leg(
        "nufft_type2_type1",
        lambda _, im: nufft1(shape, nufft2(im, coords, width=width),
                             coords, width=width).real,
        img,
    )

    # sorted-uv RadioResponse + adjoint (the production path): window
    # tables in Model.consts, sorted-adjoint gather/scatter
    rr = RadioResponse(shape, coords, width=width)

    def rr_pair(model, im):
        vis_f, vjp = jax.vjp(model, im)
        return vjp(vis_f)[0]

    leg("radio_response_pair", rr_pair, img, aux=rr)
    return rec


def main():
    sizes = (
        [int(float(a)) for a in sys.argv[1:]]
        if len(sys.argv) > 1 else [100_000, 1_000_000]
    )
    for npts in sizes:
        emit(run((512, 512), npts))


if __name__ == "__main__":
    main()
