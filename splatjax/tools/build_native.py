"""Build the native ingestion library (native/splat_ingest.cpp).

    python -m splatjax.tools.build_native

Produces splatjax/io/_splat_ingest.so, auto-detected by splatjax.io.native.
"""
from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]
SRC = REPO / "native" / "splat_ingest.cpp"
OUT = REPO / "splatjax" / "io" / "_splat_ingest.so"


def build(verbose: bool = True) -> pathlib.Path:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(SRC), "-o", str(OUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
