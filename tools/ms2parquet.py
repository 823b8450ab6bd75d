#!/usr/bin/env python3
"""Convert a CASA Measurement Set to the parquet dataset layout
`graft.io.MsDataset` reads (`<out>/<TABLE>.parquet`): MAIN plus the
ANTENNA / SPECTRAL_WINDOW / FIELD / POLARIZATION subtables, MSv2 column
names preserved, MAIN carrying an explicit `row_id` (casacore row
number — parquet has no implicit rowid and every downstream window /
join keys on it).

Real-MS mode requires python-casacore (`pip install python-casacore`),
which is NOT in this build sandbox — the code path is exercised against
real MSes on a user machine, and its schema contract is pinned here by
`--synthetic`, which fabricates the same layout from pure
numpy/pyarrow (the JVM twin `MsDataset.writeSynthetic` emits the
identical layout for the ScalaTest end-to-end).

Usage:
  tools/ms2parquet.py /data/obs.ms /data/obs.ms.pq
  tools/ms2parquet.py --synthetic 1024 /tmp/synth.ms.pq

At cluster scale convert MAIN in row chunks (--rows-per-chunk) so the
converter streams: each chunk becomes one parquet row group and Spark
parallelizes over them.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SUBTABLES = ["ANTENNA", "SPECTRAL_WINDOW", "FIELD", "POLARIZATION",
             "DATA_DESCRIPTION"]
# per-subtable key column (casacore implicit row number, materialized)
SUB_KEY = {
    "ANTENNA": "antenna_id",
    "SPECTRAL_WINDOW": "spw_id",
    "FIELD": "field_id",
    "POLARIZATION": "pol_id",
    "DATA_DESCRIPTION": "ddid",
}
MAIN_COLS = ["TIME", "ANTENNA1", "ANTENNA2", "UVW", "FIELD_ID",
             "DATA_DESC_ID", "SCAN_NUMBER", "EXPOSURE", "FLAG_ROW"]


def _col_to_arrow(name, data):
    """casacore getcol ndarray -> arrow array (2-D -> list column)."""
    a = np.asarray(data)
    if a.ndim == 1:
        return pa.array(a)
    if a.ndim == 2:
        return pa.array(list(a))
    # >2-D (e.g. DATA (row, chan, corr)): flatten trailing dims per row
    return pa.array([row.ravel() for row in a])


def convert(ms_path, out_dir, rows_per_chunk=1_000_000):
    from casacore.tables import table  # noqa: real-MS mode only
    import os
    os.makedirs(out_dir, exist_ok=True)

    with table(ms_path, ack=False) as t:
        nrow = t.nrows()
        cols = [c for c in MAIN_COLS if c in t.colnames()]
        writer = None
        for start in range(0, nrow, rows_per_chunk):
            n = min(rows_per_chunk, nrow - start)
            arrays = {"row_id": pa.array(np.arange(start, start + n))}
            for c in cols:
                arrays[c] = _col_to_arrow(c, t.getcol(c, startrow=start, nrow=n))
            batch = pa.table(arrays)
            if writer is None:
                writer = pq.ParquetWriter(f"{out_dir}/MAIN.parquet", batch.schema)
            writer.write_table(batch)
        if writer is not None:
            writer.close()
        print(f"MAIN: {nrow} rows, cols {['row_id'] + cols}")

    for sub in SUBTABLES:
        try:
            with table(f"{ms_path}::{sub}", ack=False) as t:
                # subtable ids pinned int32 (matches --synthetic and the JVM twin)
                arrays = {SUB_KEY[sub]:
                          pa.array(np.arange(t.nrows(), dtype=np.int32))}
                for c in t.colnames():
                    try:
                        arrays[c] = _col_to_arrow(c, t.getcol(c))
                    except RuntimeError:
                        pass  # undefined cells (casacore optional columns)
                pq.write_table(pa.table(arrays), f"{out_dir}/{sub}.parquet")
                print(f"{sub}: {t.nrows()} rows")
        except RuntimeError:
            print(f"{sub}: absent, skipped")


def synthetic(nrow, out_dir, nchan=8, nant=7,
              ra0=np.pi / 4, dec0=0.0):
    """The schema pin: same layout from numpy only (no casacore), and the
    twin of graft.io.MsDataset.writeSynthetic."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    # Integer widths are PINNED per MSv2 column (and asserted dtype-exact
    # by PredictPipelineSpec's schema-pin test): antenna/field/ddid/spw/pol
    # ids are int32 (casacore MS Int), row_id is int64 (casacore rownumber).
    r = np.arange(nrow)
    main = pa.table({
        "row_id": pa.array(r),  # int64
        "TIME": pa.array(5084553600.0 + (r // (nant * nant)) * 8.0),
        "ANTENNA1": pa.array((r % nant).astype(np.int32)),
        "ANTENNA2": pa.array(((r // nant) % nant).astype(np.int32)),
        "UVW": pa.array(list(np.stack([
            ((r * 7) % 2001 - 1000) / 2.0,
            ((r * 3) % 2001 - 1000) / 2.0,
            ((r * 11) % 201 - 100) / 20.0], axis=1))),
        "FIELD_ID": pa.array(np.zeros(nrow, dtype=np.int32)),
        "DATA_DESC_ID": pa.array(np.zeros(nrow, dtype=np.int32)),
    })
    pq.write_table(main, f"{out_dir}/MAIN.parquet")
    a = np.arange(nant)
    pq.write_table(pa.table({
        "antenna_id": pa.array(a.astype(np.int32)),
        "NAME": pa.array([f"ST-{i}" for i in a]),
        "POSITION": pa.array(list(np.stack([
            -1601710.0 + a * 64, -5042006.0 + a * 128,
            3554880.0 + a * 32], axis=1))),
    }), f"{out_dir}/ANTENNA.parquet")
    pq.write_table(pa.table({
        "spw_id": pa.array(np.array([0], dtype=np.int32)),
        "NUM_CHAN": pa.array(np.array([nchan], dtype=np.int32)),
        "CHAN_FREQ": pa.array([856e6 + np.arange(nchan) * 107e6]),
    }), f"{out_dir}/SPECTRAL_WINDOW.parquet")
    pq.write_table(pa.table({
        "field_id": pa.array(np.array([0], dtype=np.int32)),
        "NAME": pa.array(["FIELD0"]),
        "PHASE_DIR": pa.array([np.array([ra0, dec0])]),
    }), f"{out_dir}/FIELD.parquet")
    pq.write_table(pa.table({
        "pol_id": pa.array(np.array([0], dtype=np.int32)),
        "CORR_TYPE": pa.array([np.array([9, 10, 11, 12], dtype=np.int32)]),
    }), f"{out_dir}/POLARIZATION.parquet")
    print(f"synthetic MS dataset: {nrow} rows -> {out_dir}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--synthetic":
        synthetic(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) == 3:
        convert(sys.argv[1], sys.argv[2])
    else:
        print(__doc__)
        sys.exit(1)
