"""Deterministic synthetic GEO Series Matrix fixture (FIXTURES.md §2): the
reference's input data is not in its snapshot (.MISSING_LARGE_BLOBS), so
parity is demonstrated on a generated matrix with every semantic edge the
reference exercises — scattered NAs (imputed), a >80%-missing probe
(dropped), a constant probe (zero-variance t/corr NaN path), raw max > 100
(log2 trigger), multi-probe genes (median collapse), unmapped probes."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pandas as pd

N_PROBES, N_SAMPLES, N_CASE = 60, 16, 9


def make_expression_frame(seed: int = 17) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    samples = [f"GSM{i:04d}" for i in range(N_SAMPLES)]
    probes = [f"{1000 + i}_at" for i in range(N_PROBES)]
    base = rng.uniform(20, 4000, size=(N_PROBES, N_SAMPLES))
    base[:12, :N_CASE] *= 6.0  # differential block
    base[20, :] = 500.0  # constant probe
    vals = pd.DataFrame(base, index=probes, columns=samples)
    for r, c in [(25, 1), (25, 5), (30, 2)]:
        vals.iloc[r, c] = np.nan
    for c in range(N_SAMPLES - 2):
        vals.iloc[40, c] = np.nan  # >80% missing probe
    # quantize to the 6-decimal text representation written to the file
    return vals.apply(lambda col: col.map(lambda v: v if pd.isna(v) else float(f"{v:.6f}")))


def probe_gene_mapping() -> dict[str, str]:
    probes = [f"{1000 + i}_at" for i in range(N_PROBES)]
    return {probes[i]: f"GENE{i // 2}" for i in range(48)}  # 48 mapped, 12 not


def sample_conditions() -> dict[str, str]:
    return {
        f"GSM{i:04d}": ("case" if i < N_CASE else "control") for i in range(N_SAMPLES)
    }


def write_fixture(dir_path: str, gz: bool = False, seed: int = 17) -> tuple[str, str]:
    """Write (series_matrix, mapping_csv) into dir_path; returns the paths."""
    os.makedirs(dir_path, exist_ok=True)
    vals = make_expression_frame(seed)
    samples = list(vals.columns)
    titles = [
        f"prostate tumor sample {i}" if i < N_CASE else f"normal prostate {i}"
        for i in range(N_SAMPLES)
    ]
    lines = ['!Series_title\t"synthetic fixture"']
    lines.append("!Sample_geo_accession\t" + "\t".join(f'"{s}"' for s in samples))
    lines.append("!Sample_title\t" + "\t".join(f'"{t}"' for t in titles))
    lines.append(
        "!Sample_characteristics_ch1\t"
        + "\t".join(
            f'"tissue: {"tumor" if i < N_CASE else "normal"}"' for i in range(N_SAMPLES)
        )
    )
    lines.append("!series_matrix_table_begin")
    lines.append('"ID_REF"\t' + "\t".join(f'"{s}"' for s in samples))
    for p in vals.index:
        cells = ["" if pd.isna(v) else f"{v:.6f}" for v in vals.loc[p]]
        lines.append(f'"{p}"\t' + "\t".join(cells))
    lines.append("!series_matrix_table_end")
    text = "\n".join(lines) + "\n"

    matrix_path = os.path.join(dir_path, "series_matrix.txt" + (".gz" if gz else ""))
    if gz:
        with gzip.open(matrix_path, "wt") as f:
            f.write(text)
    else:
        with open(matrix_path, "w") as f:
            f.write(text)

    map_path = os.path.join(dir_path, "mapping.csv")
    with open(map_path, "w") as f:
        f.write("PROBEID,SYMBOL\n")
        for k, v in probe_gene_mapping().items():
            f.write(f"{k},{v}\n")
        f.write("9999_at,\n")  # empty symbol -> scrubbed by the reader
    return matrix_path, map_path
