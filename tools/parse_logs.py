#!/usr/bin/env python3
"""Run-log extractors for plotting/benchmark postprocessing.

Python-3 replacement for the reference's six Python-2 parser scripts
(``out_parser.py``, ``out_parse_CG_iter.py``,
``out_parse_RHS_assemble_walltime.py``, ``out_parse_Total_walltime.py``,
``out_parse_ncell_per_atom.py``, ``out_parse_ndofs.py`` in
``Cluster runs output and postprocessing/``), unified behind subcommands.
Each writes ``<file>.<kind>.parsed`` tab-separated tables in the same
layout the reference's gnuplot scripts consume.

    python tools/parse_logs.py cg run.log
    python tools/parse_logs.py walltime run.log
    python tools/parse_logs.py rhs-walltime run.log
    python tools/parse_logs.py ncells run.log
    python tools/parse_logs.py ndofs run.log
    python tools/parse_logs.py all run.log
"""

from __future__ import annotations

import argparse
import re
import sys

NUM = r"[+\-]?(?:[0-9]\d*)(?:\.\d*)?(?:[eE][+\-]?\d+)?"


def _lines(path):
    with open(path) as f:
        return f.readlines()


def parse_cg(lines):
    out, cycle = [], None
    for line in lines:
        m = re.match(r"Cycle (\d+):", line)
        if m:
            cycle = int(m.group(1))
        if "CG converged in" in line and cycle is not None:
            out.append((cycle, int(re.findall(NUM, line)[0])))
    return out


def parse_total_walltime(lines):
    for line in lines:
        if "Total Elapsed wall time" in line:
            return float(re.findall(NUM, line)[0])
    return None


def parse_section_walltime(lines, sections=("Assemble system",
                                            "Compute charge densities",
                                            "RHS assembly optimization")):
    out = {}
    for line in lines:
        for s in sections:
            if line.strip().startswith("| " + s):
                nums = re.findall(NUM, line.split("|")[3])
                if nums:
                    out[s] = float(nums[0])
    return out


def parse_ncells(lines):
    out, cycle = [], None
    for line in lines:
        m = re.match(r"Cycle (\d+):", line)
        if m:
            cycle = int(m.group(1))
        if "Number of active cells" in line and cycle is not None:
            out.append((cycle, int(re.findall(NUM, line)[0])))
    return out


def parse_ndofs(lines):
    out, cycle = [], None
    for line in lines:
        m = re.match(r"Cycle (\d+):", line)
        if m:
            cycle = int(m.group(1))
        m = re.search(r"Number of degrees of freedom: (\d+)", line)
        if m and cycle is not None:
            out.append((cycle, int(m.group(1))))
    return out


def parse_natoms(lines):
    for line in lines:
        if "Number of atoms" in line:
            return int(re.findall(NUM, line)[0])
    return None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("kind", choices=["cg", "walltime", "rhs-walltime",
                                     "ncells", "ndofs", "all"])
    ap.add_argument("file")
    args = ap.parse_args(argv)
    lines = _lines(args.file)
    natoms = parse_natoms(lines)

    def emit(kind, rows, header):
        path = f"{args.file}.{kind}.parsed"
        with open(path, "w") as f:
            f.write(header + "\n")
            if natoms is not None:
                f.write(f"{natoms}\n")
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")
        print("wrote", path)

    if args.kind in ("cg", "all"):
        emit("cg", parse_cg(lines), "# Cycle | number of CG iterations")
    if args.kind in ("walltime", "all"):
        t = parse_total_walltime(lines)
        emit("walltime", [(t,)] if t is not None else [],
             "# Total wall time (s)")
    if args.kind in ("rhs-walltime", "all"):
        d = parse_section_walltime(lines)
        emit("rhs_walltime", sorted(d.items()), "# Section | wall time (s)")
    if args.kind in ("ncells", "all"):
        emit("ncells", parse_ncells(lines), "# Cycle | active cells")
    if args.kind in ("ndofs", "all"):
        emit("ndofs", parse_ndofs(lines), "# Cycle | DoFs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
