#!/usr/bin/env python3
"""Dev-only one-shot: run graft.Verify for selected queries, then the
oracle compare, in one command.

Usage: python3 scripts/verify_one.py <query> [query ...]
       SF_DIR=/root/testdata/sf0.01 python3 scripts/verify_one.py q38_percentiles

Runs `sbt "runMain graft.Verify <sfDir> <outDir> <queries...>"` and then
scripts/check_oracle.py over the written output.
"""
import os
import subprocess
import sys

sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
out_dir = os.environ.get("OUT_DIR", "/tmp/verify_out")
queries = sys.argv[1:]

cmd = ["sbt", "-batch",
       f"runMain graft.Verify {sf_dir} {out_dir} " + " ".join(queries)]
r = subprocess.run(cmd, cwd="/root/repo")
if r.returncode != 0:
    sys.exit(r.returncode)
sys.exit(subprocess.run(
    [sys.executable, "scripts/check_oracle.py", sf_dir, out_dir] + queries,
    cwd="/root/repo").returncode)
