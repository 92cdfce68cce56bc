"""Parser for the reference's golden output files
(tests/gaussian-charges.mpirun=N.output) into per-cycle dicts."""

import re


def parse_golden(path):
    cycles = []
    cur = None
    for line in open(path):
        m = re.match(r"Cycle (\d+):", line)
        if m:
            cur = {"cycle": int(m.group(1))}
            cycles.append(cur)
            continue
        if cur is None:
            continue

        def grab(pat, key, cast=float):
            mm = re.search(pat, line)
            if mm:
                cur[key] = cast(mm.group(1))
                return True
            return False

        if grab(r"Number of active cells:\s+(\d+)", "n_cells", int):
            continue
        m = re.search(r"Number of degrees of freedom: (\d+) \(by level: ([\d, ]+)\)",
                      line)
        if m:
            cur["n_dofs"] = int(m.group(1))
            cur["dofs_by_level"] = [int(s) for s in m.group(2).split(",")]
            continue
        if grab(r"L1 rhs norm ([\d.e+-]+)", "l1_rhs"):
            continue
        if grab(r"L2 rhs norm ([\d.e+-]+)", "l2_rhs"):
            continue
        if grab(r"LInfinity rhs norm ([\d.e+-]+)", "linf_rhs"):
            continue
        if grab(r"L1 Matrix norm ([\d.e+-]+)", "l1_mat"):
            continue
        if grab(r"LInfinity Matrix norm ([\d.e+-]+)", "linf_mat"):
            continue
        if grab(r"Frobenius Matrix norm ([\d.e+-]+)", "fro_mat"):
            continue
        if grab(r"Starting value ([\d.e+-]+)", "cg_start"):
            continue
        if grab(r"CG converged in (\d+) iterations", "cg_iterations", int):
            continue
        if grab(r"Convergence value ([\d.e+-]+)", "cg_final"):
            continue
        if grab(r"L1 solution norm ([\d.e+-]+)", "l1_sol"):
            continue
        if grab(r"L2 solution norm ([\d.e+-]+)", "l2_sol"):
            continue
        if grab(r"LInfinity solution norm ([\d.e+-]+)", "linf_sol"):
            continue
        if grab(r"Threshold value for refinement:\s+([\d.e+-]+)", "threshold"):
            continue
        if grab(r"Total analytical electrostatic energy :\s+([\d.e+-]+)",
                "e_analytic"):
            continue
        if grab(r"Short-ranged energy contribution :\s+([\d.e+-]+)", "e_short"):
            continue
        if grab(r"FE solution long-ranged energy contribution :\s+([\d.e+-]+)",
                "e_fe_long"):
            continue
        if grab(r"Self energy contribution : ([\d.e+-]+)", "e_self"):
            continue
        if grab(r"Total electrostatic energy with split in short- and "
                r"long-ranged : ([\d.e+-]+)", "e_total_split"):
            continue
        if grab(r"Absolute Error between both energies :\s+([\d.e+-]+)",
                "e_abs_error"):
            continue
        if grab(r"Error in FE solution in energy norm:\s+([\d.e+-]+)",
                "energy_norm_error"):
            continue
    return cycles


GOLDEN_GAUSSIAN = "/root/reference/tests/gaussian-charges.mpirun=1.output"
