"""VTU/PVTU/VisIt output (io/vtu.py — the analogue of
src/step-50.cc:1149-1308): files must be well-formed XML with consistent
piece/point/cell counts and parseable back."""

import os
import xml.etree.ElementTree as ET

import numpy as np

from coulomb_gmg_tpu.mesh.forest import Forest
from coulomb_gmg_tpu.io.vtu import (write_vtu, write_pvtu,
                                    write_visit_record, nodal_gradient)


def test_vtu_roundtrip(tmp_path):
    f = Forest.uniform(3, 4, np.zeros(3), 0.25)
    u = np.linspace(0.0, 1.0, f.dofs.n_dofs)
    grad = nodal_gradient(f, u)
    piece = str(tmp_path / "solution-00000.0000.vtu")
    write_vtu(piece, f, {"solution": u, "grad_phi": grad},
              {"subdomain": np.zeros(f.n_cells)})
    root = ET.parse(piece).getroot()
    assert root.tag == "VTKFile"
    pd = root.find(".//Piece")
    assert int(pd.get("NumberOfCells")) == f.n_cells
    names = {d.get("Name") for d in root.findall(".//DataArray")}
    assert {"solution", "grad_phi", "subdomain"} <= names

    master = str(tmp_path / "solution-00000.pvtu")
    write_pvtu(master, [piece], point_names=["solution", "grad_phi"],
               cell_names=["subdomain"])
    proot = ET.parse(master).getroot()
    assert proot.tag == "VTKFile"
    assert len(proot.findall(".//Piece")) == 1

    visit = str(tmp_path / "solution-00000.visit")
    write_visit_record(visit, [piece])
    assert os.path.getsize(visit) > 0


def test_nodal_gradient_linear_field_exact():
    # u = 2x - 3y + z has constant gradient; nodal_gradient renders the
    # FIELD -grad(phi) (GradientPostprocessor, src/step-50.cc:1123-1147)
    f = Forest.uniform(3, 5, np.zeros(3), 0.2)
    pos = f.dofs.positions
    u = 2 * pos[:, 0] - 3 * pos[:, 1] + pos[:, 2]
    g = nodal_gradient(f, u)
    assert np.allclose(g, -np.array([2.0, -3.0, 1.0]), atol=1e-12)
