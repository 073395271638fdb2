"""Meshes container shim — the reference only constructs it to hand
verts/faces to rasterize_meshes (utils.py:52)."""
from __future__ import annotations


class Meshes:
    def __init__(self, verts, faces, textures=None):
        # (B, N, 3) float and (B, F, 3) long/int tensors.
        self.verts = verts
        self.faces = faces
        self.textures = textures
