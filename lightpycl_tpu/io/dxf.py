"""Minimal ASCII DXF (R12) writer: scene triangles as 3DFACE, ray paths as
LINE entities.

Reference parity: the dxfwrite-based `save_traced_scene` export of
iterative_tracer.py (SURVEY.md §3 'DXF export'). dxfwrite isn't available
in this environment (and isn't needed): R12 3DFACE/LINE entities are a
trivial group-code format emitted by hand, so the export has zero deps.
"""

from __future__ import annotations

import numpy as np


class DXFWriter:
    def __init__(self):
        self._entities: list[str] = []

    def add_3dface(self, p0, p1, p2, p3=None, layer: str = "mesh"):
        """Triangle (p3 omitted -> repeated last vertex) or quad face."""
        if p3 is None:
            p3 = p2
        e = ["0", "3DFACE", "8", layer]
        # DXF point group codes: corner i -> x=10+i, y=20+i, z=30+i
        for i, p in enumerate((p0, p1, p2, p3)):
            for axis in range(3):
                e += [str(10 + i + 10 * axis), f"{float(p[axis]):.9g}"]
        self._entities.append("\n".join(e))

    def add_line(self, start, end, layer: str = "rays"):
        e = ["0", "LINE", "8", layer,
             "10", f"{float(start[0]):.9g}", "20", f"{float(start[1]):.9g}",
             "30", f"{float(start[2]):.9g}",
             "11", f"{float(end[0]):.9g}", "21", f"{float(end[1]):.9g}",
             "31", f"{float(end[2]):.9g}"]
        self._entities.append("\n".join(e))

    def add_mesh(self, vertices, triangles, layer: str = "mesh"):
        v = np.asarray(vertices)
        for tri in np.asarray(triangles):
            self.add_3dface(v[tri[0]], v[tri[1]], v[tri[2]], layer=layer)

    def tostring(self) -> str:
        head = "0\nSECTION\n2\nENTITIES"
        tail = "0\nENDSEC\n0\nEOF"
        return "\n".join([head, *self._entities, tail]) + "\n"

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.tostring())


def load_dxf_mesh(path: str, material="terminator", ior: float = 1.0,
                  **kw):
    """Read 3DFACE entities from a DXF file into a GeoObject (triangulating
    quads). Reference survey flagged DXF import as a possible reference
    capability (SURVEY.md §8.5); supported here for round-tripping scenes
    written by `save_traced_scene` and for CAD-sourced optics.
    """
    from lightpycl_tpu.geometry.mesh import GeoObject

    verts: list = []
    tris: list = []
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 0
    while i < len(lines) - 1:
        if lines[i] == "0" and lines[i + 1] == "3DFACE":
            corners = {}
            i += 2
            while i < len(lines) - 1 and lines[i] != "0":
                code = lines[i]
                try:
                    corners[int(code)] = float(lines[i + 1])
                except ValueError:
                    pass
                i += 2
            pts = []
            for c in range(4):
                try:
                    pts.append((corners[10 + c], corners[20 + c], corners[30 + c]))
                except KeyError:
                    break
            if len(pts) >= 3:
                base = len(verts)
                verts.extend(pts[:3])
                tris.append((base, base + 1, base + 2))
                if len(pts) == 4 and pts[3] != pts[2]:
                    verts.append(pts[3])
                    tris.append((base, base + 2, base + 3))
        else:
            i += 1
    if not tris:
        raise ValueError(f"no 3DFACE entities found in {path}")
    return GeoObject(np.asarray(verts, np.float64), np.asarray(tris, np.int32),
                     material, ior, **kw)


def save_traced_scene(path: str, elements, segments=(), max_rays_per_iter: int = 1000):
    """Write scene meshes + traced ray segments to a DXF file.

    `segments` is TraceResult.segments (record_paths=True): per iteration
    (starts (C,3), ends (C,3), alive (C,)).
    """
    w = DXFWriter()
    for i, el in enumerate(elements):
        w.add_mesh(el.vertices, el.triangles, layer=el.name or f"element_{i}")
    for starts, ends, alive in segments:
        idx = np.nonzero(alive)[0][:max_rays_per_iter]
        for i in idx:
            w.add_line(starts[i], ends[i])
    w.save(path)
    return path
