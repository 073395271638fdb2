"""Fragments namedtuple shim (pytorch3d.renderer.mesh.rasterizer)."""
from collections import namedtuple

Fragments = namedtuple("Fragments",
                       ["pix_to_face", "zbuf", "bary_coords", "dists"])
