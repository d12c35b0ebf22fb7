"""Marching tetrahedra: a sphere SDF must mesh to ~a sphere."""

import numpy as np

from lzzx_nerf_tpu.ops.mesh import (extract_geometry, marching_tetrahedra,
                                    save_obj, save_ply)


def test_sphere_mesh():
    R = 48
    ax = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 0.6 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)   # >0 inside r=0.6
    verts, faces = marching_tetrahedra(vol, 0.0, origin=(-1, -1, -1),
                                       spacing=(2 / (R - 1),) * 3)
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.6) < 0.02
    assert r.std() < 0.02
    assert faces.max() < len(verts)


def test_sphere_winding_consistent():
    """Every face of a convex iso-surface must wind counter-clockwise seen
    from outside (normal . vertex > 0 for a centered sphere) — guards the
    per-case orientation in _tet_triangles; complement sign codes used to
    emit the same vertex order as their mirror case."""
    R = 32
    ax = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 0.55 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    verts, faces = marching_tetrahedra(vol, 0.0, origin=(-1, -1, -1),
                                       spacing=(2 / (R - 1),) * 3)
    tri = verts[faces]                                   # [T, 3, 3]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = (n * tri.mean(1)).sum(-1)
    assert (outward > 0).all(), f"{(outward <= 0).sum()}/{len(faces)} inward"

    # inverted field (inside is now outside) must flip every normal
    verts2, faces2 = marching_tetrahedra(-vol, 0.0, origin=(-1, -1, -1),
                                         spacing=(2 / (R - 1),) * 3)
    tri2 = verts2[faces2]
    n2 = np.cross(tri2[:, 1] - tri2[:, 0], tri2[:, 2] - tri2[:, 0])
    assert ((n2 * tri2.mean(1)).sum(-1) < 0).all()


def test_extract_geometry_and_save(tmp_path):
    def query(pts):
        return 10.0 * (np.linalg.norm(pts, axis=-1) < 0.4)

    verts, faces = extract_geometry([-1, -0.5, -1], [1, 0.5, 1],
                                    resolution=40, threshold=5.0,
                                    query_func=query)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - 0.4) < 0.05

    obj = tmp_path / "m.obj"
    ply = tmp_path / "m.ply"
    save_obj(str(obj), verts, faces)
    save_ply(str(ply), verts, faces)
    assert obj.read_text().startswith("v ")
    assert ply.read_bytes().startswith(b"ply")


def test_empty_volume():
    vol = np.zeros((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts) == 0 and len(faces) == 0
