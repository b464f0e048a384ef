"""Sample persistence and export (hdf5, minimal FITS, pickle).

Parity: ``SampleList`` persistence (``src/minimization/sample_list.py
:371-441`` pickle save/load, ``:107`` hdf5 export, ``:189-258`` FITS
export).  Exports apply arbitrary operator callables to every sample and
write sample/mean/std datasets; checkpoints use host-numpy pickles safe
to reload on any backend/mesh.  The FITS writer is self-contained
(single image HDU with basic WCS keywords) since astropy is not vendored.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Mapping, Optional

import numpy as np
from jax.tree_util import tree_map

from .evi import Samples
from .tree import mean_and_std, stack


def save_samples(samples: Samples, path: str):
    """Pickle a host-numpy copy of the samples (mesh-independent)."""
    host = tree_map(np.asarray, samples)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_samples(path: str) -> Samples:
    with open(path, "rb") as f:
        return pickle.load(f)


def _apply_ops(samples: Samples, ops: Mapping[str, Callable]):
    for name, op in ops.items():
        outs = stack([np.asarray(op(s)) for s in samples]) if len(samples) \
            else np.asarray(op(samples.pos))[None]
        yield name, np.asarray(outs)


def save_samples_to_hdf5(samples: Samples, path: str,
                         ops: Mapping[str, Callable], *,
                         overwrite: bool = False,
                         samples_datasets: bool = True):
    """Write ``{name}/{mean,std,samples}`` datasets of operator outputs."""
    import h5py

    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    with h5py.File(path, "w") as f:
        for name, outs in _apply_ops(samples, ops):
            grp = f.create_group(str(name))
            grp.create_dataset("mean", data=outs.mean(axis=0))
            if outs.shape[0] > 1:
                grp.create_dataset("std", data=outs.std(axis=0, ddof=1))
            if samples_datasets:
                grp.create_dataset("samples", data=outs)


def _fits_card(key, value, comment=""):
    if isinstance(value, bool):
        v = "T" if value else "F"
        card = f"{key:8s}= {v:>20s}"
    elif isinstance(value, (int, float)):
        card = f"{key:8s}= {value:>20}"
    elif value is None:
        card = f"{key:8s}"
    else:
        card = f"{key:8s}= '{value}'"
    if comment:
        card += f" / {comment}"
    return card[:80].ljust(80)


def write_fits(path: str, array: np.ndarray, *, overwrite: bool = False,
               extra_header: Optional[Mapping] = None):
    """Write a minimal single-HDU FITS image (float64, big-endian)."""
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    data = np.asarray(array, dtype=">f8")
    cards = [
        _fits_card("SIMPLE", True, "conforms to FITS standard"),
        _fits_card("BITPIX", -64),
        _fits_card("NAXIS", data.ndim),
    ]
    for i, n in enumerate(reversed(data.shape)):
        cards.append(_fits_card(f"NAXIS{i + 1}", int(n)))
    for k, v in (extra_header or {}).items():
        cards.append(_fits_card(str(k)[:8].upper(), v))
    cards.append("END".ljust(80))
    header = "".join(cards)
    header += " " * ((2880 - len(header) % 2880) % 2880)
    payload = data.tobytes()
    payload += b"\0" * ((2880 - len(payload) % 2880) % 2880)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(payload)


def read_fits(path: str) -> np.ndarray:
    """Read back a FITS image written by :func:`write_fits`."""
    with open(path, "rb") as f:
        raw = f.read()
    header = raw[: raw.index(b"END")].decode("ascii", errors="ignore")
    cards = {c.split("=")[0].strip(): c.split("=", 1)[1].split("/")[0].strip()
             for c in [header[i:i + 80] for i in range(0, len(header), 80)]
             if "=" in c}
    naxis = int(cards["NAXIS"])
    shape = tuple(
        int(cards[f"NAXIS{i}"]) for i in range(naxis, 0, -1)
    )
    n_header_blocks = (raw.index(b"END") // 2880) + 1
    data = np.frombuffer(
        raw[2880 * n_header_blocks:
            2880 * n_header_blocks + 8 * int(np.prod(shape))],
        dtype=">f8",
    )
    return data.reshape(shape)


def save_samples_to_fits(samples: Samples, file_name_base: str,
                         op: Callable, *, overwrite: bool = False,
                         samples_files: bool = False):
    """Write mean/std (and optionally per-sample) FITS images of ``op``."""
    outs = np.stack([np.asarray(op(s)) for s in samples]) if len(samples) \
        else np.asarray(op(samples.pos))[None]
    write_fits(file_name_base + ".mean.fits", outs.mean(0),
               overwrite=overwrite)
    if outs.shape[0] > 1:
        write_fits(file_name_base + ".std.fits", outs.std(0, ddof=1),
                   overwrite=overwrite)
    if samples_files:
        for i, o in enumerate(outs):
            write_fits(f"{file_name_base}.sample_{i}.fits", o,
                       overwrite=overwrite)


def save_checkpoint_orbax(path: str, samples: Samples, state=None):
    """Multi-host-safe array checkpoint via orbax/tensorstore.

    The SURVEY-recommended replacement for pickle checkpoints on pod
    slices: every host writes its shards; restore works on any mesh.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = {"samples": {
        "pos": samples.pos, "samples": samples._samples,
        "keys": samples.keys,
    }}
    if state is not None:
        payload["nit"] = np.asarray(getattr(state, "nit", 0))
        payload["key"] = np.asarray(getattr(state, "key", None))
    ckptr.save(os.path.abspath(path), payload, force=True)


def load_checkpoint_orbax(path: str):
    """Restore ``(samples, aux_dict)`` from an orbax checkpoint."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    s = payload["samples"]
    samples = Samples(pos=s["pos"], samples=s["samples"], keys=s.get("keys"))
    aux = {k: v for k, v in payload.items() if k != "samples"}
    return samples, aux
