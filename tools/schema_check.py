"""Corpus schema sentinel: detect driver-side testdata regeneration
drift BEFORE it breaks the suite.

Round 4 opened with a hard failure because the driver regenerated
`/root/testdata` with `events.ts` as TIMESTAMP(MICROS) where rounds
1-3 shipped TIMESTAMP(NANOS): every `ts_ns` consumer and 23 oracles
sat on the old assumption. The fix (catalog.load_table normalizing
both generations) took an hour of diagnosis that this tool reduces to
one command.

Usage:
    python tools/schema_check.py            # diff live schemas vs pinned
    python tools/schema_check.py --pin      # re-pin (after adapting code)

Exit 0 = no drift; exit 1 = drift (printed per table/column). The pin
lives in tools/schema_pin.json and is committed, so the FIRST command
of a new round can be this check.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PIN_PATH = os.path.join(REPO, "tools", "schema_pin.json")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def live_schemas(sf_dir: str) -> dict[str, list[list[str]]]:
    out = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            out[t] = [["<MISSING FILE>", ""]]
            continue
        s = pq.read_schema(path)
        out[t] = [[n, str(ty)] for n, ty in zip(s.names, s.types)]
    return out


def main() -> None:
    if "--pin" in sys.argv:
        pin = {d: live_schemas(d) for d in SF_DIRS if os.path.isdir(d)}
        with open(PIN_PATH, "w") as f:
            json.dump(pin, f, indent=1, sort_keys=True)
        print(f"pinned {sum(len(v) for v in pin.values())} table schemas -> {PIN_PATH}")
        return

    if not os.path.exists(PIN_PATH):
        print(f"no pin at {PIN_PATH}; run with --pin first")
        sys.exit(1)

    pin = json.load(open(PIN_PATH))
    drift = []
    for sf_dir, tables in pin.items():
        if not os.path.isdir(sf_dir):
            drift.append(f"{sf_dir}: directory gone")
            continue
        live = live_schemas(sf_dir)
        for t, pinned_cols in tables.items():
            live_cols = live.get(t, [["<MISSING TABLE>", ""]])
            if live_cols != pinned_cols:
                drift.append(
                    f"{sf_dir}/{t}: pinned={pinned_cols} live={live_cols}"
                )
    if drift:
        print("SCHEMA DRIFT DETECTED — the driver regenerated testdata with new")
        print("schemas. Audit catalog.load_table normalization + every oracle")
        print("touching the drifted columns before trusting any green/red signal:")
        for d in drift:
            print(" -", d)
        sys.exit(1)
    print("schemas match pin (no drift)")


if __name__ == "__main__":
    main()
