"""PLY point-cloud I/O.

Writer replicates ``outputPLYFile`` (stereo/multiviewstereo.cpp:291-315):
ASCII format, float x/y/z + uchar diffuse_red/green/blue.  The reader handles
both ASCII and binary_little_endian files with arbitrary vertex properties
(the reference's MainWindow PLY loader supports binary too,
gui/mainwindow.cpp:277-475).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

_STRUCT_FMT = {
    "char": "b", "int8": "b",
    "uchar": "B", "uint8": "B",
    "short": "h", "int16": "h",
    "ushort": "H", "uint16": "H",
    "int": "i", "int32": "i",
    "uint": "I", "uint32": "I",
    "float": "f", "float32": "f",
    "double": "d", "float64": "d",
}


def write_ply(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None) -> None:
    """Write an ASCII PLY file in the reference's exact layout.

    points: [N, 3] float; colors: [N, 3] in 0..255 (defaults to white).
    """
    points = np.asarray(points)
    n = len(points)
    if colors is None:
        colors = np.full((n, 3), 255)
    colors = np.asarray(colors).astype(int)

    with open(path, "w") as f:
        f.write("ply\n"
                "format ascii 1.0\n"
                f"element vertex {n}\n"
                "property float x\n"
                "property float y\n"
                "property float z\n"
                "property uchar diffuse_red\n"
                "property uchar diffuse_green\n"
                "property uchar diffuse_blue\n"
                "end_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]:g} {p[1]:g} {p[2]:g} {c[0]} {c[1]} {c[2]}\n")


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read ASCII or binary_little_endian PLY; returns (xyz [N,3], rgb [N,3]
    or None)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        fmt = None
        n_vertex = 0
        props = []           # (name, type) for the vertex element
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unterminated PLY header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n_vertex = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                if parts[1] == "list":
                    raise ValueError("list properties unsupported for vertex")
                props.append((parts[2], parts[1]))
            elif parts[0] == "end_header":
                break

        names = [p[0] for p in props]
        if fmt == "ascii":
            data = np.loadtxt(
                [f.readline() for _ in range(n_vertex)], ndmin=2)
        elif fmt == "binary_little_endian":
            rec = "<" + "".join(_STRUCT_FMT[t] for _, t in props)
            size = struct.calcsize(rec)
            raw = f.read(size * n_vertex)
            data = np.array([struct.unpack_from(rec, raw, i * size)
                             for i in range(n_vertex)], dtype=np.float64)
        else:
            raise ValueError(f"unsupported PLY format {fmt!r}")

    def col(name_options):
        for nm in name_options:
            if nm in names:
                return data[:, names.index(nm)]
        return None

    xyz = np.stack([col(["x"]), col(["y"]), col(["z"])], axis=-1)
    r = col(["diffuse_red", "red", "r"])
    if r is not None:
        rgb = np.stack([r, col(["diffuse_green", "green", "g"]),
                        col(["diffuse_blue", "blue", "b"])], axis=-1)
    else:
        rgb = None
    return xyz, rgb
