"""Bulk text-triple parsing and SPPMI construction.

Counterpart of the reference's native data kernels
(``buffalo/data/fileio.hpp``): triple parsing + CSR compression
(``sort_and_compressed_binarization``, ``fileio.hpp:263-419``) and the
two-pass SPPMI co-occurrence builder (``parallel_build_sppmi``,
``fileio.hpp:109-250``).  The hot path here is vectorized numpy/pandas
(C parsers); an optional OpenMP C++ kernel (``native/``) accelerates
the parse+sort path for out-of-core scale and is used when available.
"""
from __future__ import annotations

import io
from typing import Optional, Tuple

import numpy as np

try:
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None


def parse_triples(path_or_buf, num_header_lines: int = 0
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse whitespace-separated ``row col [val]`` lines into numpy arrays.

    Returns (rows[int64], cols[int64], vals[float32]); a missing third
    column defaults to 1.0.  Indices are returned as found in the file
    (callers handle 1-based MatrixMarket offsets).
    """
    if pd is not None:
        df = pd.read_csv(
            path_or_buf, sep=r"\s+", header=None, skiprows=num_header_lines,
            comment="%", engine="c", dtype=np.float64)
        if df.shape[1] < 2:
            raise RuntimeError("Expected at least 2 columns of triple data")
        rows = df.iloc[:, 0].to_numpy(np.int64)
        cols = df.iloc[:, 1].to_numpy(np.int64)
        if df.shape[1] >= 3:
            vals = df.iloc[:, 2].to_numpy(np.float32)
        else:
            vals = np.ones(len(rows), dtype=np.float32)
        return rows, cols, vals
    # numpy fallback
    data = np.loadtxt(path_or_buf, comments="%", skiprows=num_header_lines,
                      ndmin=2)
    rows = data[:, 0].astype(np.int64)
    cols = data[:, 1].astype(np.int64)
    vals = (data[:, 2] if data.shape[1] >= 3
            else np.ones(len(rows))).astype(np.float32)
    return rows, cols, vals


def parse_triples_text(text: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    return parse_triples(io.StringIO(text))


def parse_triples_file(path: str, skip_bytes: int = 0
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a triples file from a byte offset; native kernel when built."""
    from buffalo_tpu.data import native
    result = native.parse_triples_native(path, skip_bytes)
    if result is not None:
        return result
    with open(path) as fin:
        fin.seek(skip_bytes)
        return parse_triples(fin)


def build_csr(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
              num_rows: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort triples by (row, col) into CSR; native counting sort when
    available, np.lexsort otherwise."""
    from buffalo_tpu.data import native
    result = native.build_csr_native(rows, cols, vals, num_rows)
    if result is not None:
        return result
    order = np.lexsort((cols, rows))
    key = cols[order].astype(np.int32, copy=False)
    val = vals[order].astype(np.float32, copy=False)
    indptr = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=num_rows), out=indptr[1:])
    return indptr, key, val


def build_sppmi(indptr: np.ndarray, keys: np.ndarray, num_items: int,
                window: int = 5, k: int = 1,
                logger=None) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Build the shifted-positive-PMI co-occurrence matrix from streams.

    Same math as the reference (``fileio.hpp:109-250``): for every row
    (user sequence), each ordered pair of items within ``window`` of
    each other counts one symmetric co-occurrence; then
    ``sppmi = max(0, log(#(w,c) * D / (#w * #c)) - log k)`` and only
    positive entries are kept.  Returns CSR (indptr, key, val) over
    ``num_items`` rows, or None when no pair survives.
    """
    n_rows = len(indptr) - 1
    keys = np.asarray(keys)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64),
                        np.diff(np.asarray(indptr)))
    pair_rows = []
    pair_cols = []
    for off in range(1, window + 1):
        if off >= len(keys):
            break
        same_row = row_ids[:-off] == row_ids[off:]
        pair_rows.append(keys[:-off][same_row])
        pair_cols.append(keys[off:][same_row])
    if not pair_rows:
        return None
    a = np.concatenate(pair_rows).astype(np.int64)
    b = np.concatenate(pair_cols).astype(np.int64)
    if len(a) == 0:
        return None
    # symmetric counting: (a, b) and (b, a)
    rows = np.concatenate([a, b])
    cols = np.concatenate([b, a])

    lin = rows * num_items + cols
    uniq, counts = np.unique(lin, return_counts=True)
    rr = (uniq // num_items).astype(np.int64)
    cc = (uniq % num_items).astype(np.int64)
    d_total = float(len(rows))
    occ = np.bincount(rows, minlength=num_items).astype(np.float64)
    pmi = np.log(counts.astype(np.float64) * d_total / (occ[rr] * occ[cc]))
    sppmi = pmi - np.log(float(k))
    keep = sppmi > 0
    if not np.any(keep):
        return None
    rr, cc, vv = rr[keep], cc[keep], sppmi[keep].astype(np.float32)
    order = np.lexsort((cc, rr))
    rr, cc, vv = rr[order], cc[order], vv[order]
    out_indptr = np.zeros(num_items + 1, dtype=np.int64)
    np.cumsum(np.bincount(rr, minlength=num_items), out=out_indptr[1:])
    return out_indptr, cc.astype(np.int32), vv
