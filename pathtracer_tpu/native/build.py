"""Build the native C++ runtime library with g++ (no external deps)."""
from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "src", "ptnative.cpp")
OUT = os.path.join(_HERE, "libptnative.so")


def build(quiet: bool = False) -> str:
    if not os.path.exists(SRC):
        raise FileNotFoundError(SRC)
    if (os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           SRC, "-o", OUT, "-lz"]
    kw = dict(check=True)
    if quiet:
        kw.update(stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    subprocess.run(cmd, **kw)
    return OUT


if __name__ == "__main__":
    print(build())
