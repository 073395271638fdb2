"""MPMeshVid — the stage-2 model: Multi-plane Tile Video.

Static tile textures + a per-frame dynamic tile stack, rendered by the
same homography plane sweep as stage 1.  Parity: reference MPV.py:26-557.

Phases:
* dense  (scratch init or dense stage-1 ckpt): the whole scene is one
  dynamic dense stack ``atlas_dyn (F, D, Ht, Wt, 4)`` (the reference
  keeps an inert static atlas + empty faces, MPV.py:95-104).
* sparse (from a culled stage-1 ckpt): ``atlas (Ns, th, tw, C)`` static
  tiles + ``atlas_dyn (F, Nd, th, tw, 4)`` dynamic tiles with the
  per-plane tile maps from the culling.

The coarse-to-fine pyramid (`lod`) resizes tile textures (sparse) or the
dense stack (dense) from the stored full-resolution base, mirroring
MPV.py:140-198 — but no UV re-alignment is needed here because tile
addressing is analytic, not baked into UV buffers.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from videoloop3d_tpu.core.activations import ACTIVATIONS
from videoloop3d_tpu.losses import regularizers as regs
from videoloop3d_tpu.models.geometry import MPIGeometry
from videoloop3d_tpu.models.mpmesh import MPMeshConfig, decode_rgba
from videoloop3d_tpu.render import renderer as R


class MPMeshVid:
    def __init__(self, args, H, W, ref_extrin, ref_intrin, near, far):
        self.base_geom = MPIGeometry.create(args, H, W, ref_extrin,
                                            ref_intrin, near, far)
        self.geom = self.base_geom
        self.cfg = MPMeshConfig.from_args(args)
        self.H, self.W = H, W
        self.frm_num = int(args.mpv_frm_num)
        self.isloop = bool(args.mpv_isloop)
        self.init_std = float(args.init_std)
        self.is_sparse = False
        self.has_dyn = True
        self.tile_map_static: Optional[np.ndarray] = None
        self.tile_map_dyn: Optional[np.ndarray] = None
        self.tile_hw: Optional[tuple] = None
        self.base_tile_hw: Optional[tuple] = None
        self.dtype = jnp.bfloat16 if args.fp16 else jnp.float32

    # ------------------------------------------------------------------
    def init_params(self, seed=0):
        """Scratch init (dense): ref MPV.py:83-110."""
        g = self.base_geom
        rng = np.random.default_rng(seed)
        dyn = rng.standard_normal(
            (self.frm_num, g.n_planes, g.mpi_h, g.mpi_w, 4)) * self.init_std
        dyn = dyn.astype(np.float32)
        if self.cfg.rgb_mlp_type == "direct":
            dyn[..., -1] = -2.0
        return {"atlas": jnp.zeros((0, 1, 1, 4), self.dtype),
                "atlas_dyn": jnp.asarray(dyn, self.dtype),
                "verts": jnp.asarray(g.vertex_grid())}

    def init_from_stage1(self, ckpt):
        """Consume a stage-1 checkpoint (ref MPV.py:235-288 init_from_mpi).

        Returns params.  Sparse ckpt: static tiles stay static, dynamic
        tiles broadcast over frames.  Dense ckpt: whole atlas becomes the
        dynamic stack, static empty.
        """
        meta, p = ckpt["meta"], ckpt["params"]
        self.base_geom = ckpt["geom"]
        self.geom = ckpt["geom"]
        if meta["is_sparse"]:
            self.is_sparse = True
            self.tile_map_static = ckpt["tile_map_static"]
            self.tile_map_dyn = ckpt["tile_map_dyn"]
            self.tile_hw = tuple(meta["tile_hw"])
            self.base_tile_hw = self.tile_hw
            dyn = np.broadcast_to(
                p["atlas_dyn"][None],
                (self.frm_num,) + p["atlas_dyn"].shape).copy()
            params = {"atlas": jnp.asarray(p["atlas"], self.dtype),
                      "atlas_dyn": jnp.asarray(dyn, self.dtype)}
        else:
            self.is_sparse = False
            dyn = np.broadcast_to(
                p["atlas"][None], (self.frm_num,) + p["atlas"].shape).copy()
            params = {"atlas": jnp.zeros((0, 1, 1, 4), self.dtype),
                      "atlas_dyn": jnp.asarray(dyn, self.dtype)}
        if "verts" in p:
            params["verts"] = jnp.asarray(p["verts"])
        return params

    # ------------------------------------------------------------------
    def lod(self, params, factor):
        """Level-of-detail resize from the full-resolution base.
        Returns new params (ref MPV.py:140-198)."""
        if self.is_sparse:
            bth, btw = self.base_tile_hw
            nth = max(int(bth * factor), 2)
            ntw = max(int(btw * factor), 2)
            if (nth, ntw) == self.tile_hw:
                return params
            out = dict(params)
            for key in ("atlas", "atlas_dyn"):
                t = params[key]
                if t.shape[-4] == 0 and t.ndim == 4:
                    continue
                shape = t.shape[:-3] + (nth, ntw, t.shape[-1])
                out[key] = jax.image.resize(
                    t.astype(jnp.float32), shape, "linear").astype(t.dtype)
            self.tile_hw = (nth, ntw)
            return out
        # dense phase
        bh, bw = self.base_geom.mpi_h, self.base_geom.mpi_w
        nh, nw = int(bh * factor), int(bw * factor)
        if (nh, nw) == (self.geom.mpi_h, self.geom.mpi_w):
            return params
        out = dict(params)
        t = params["atlas_dyn"]
        shape = t.shape[:-3] + (nh, nw, t.shape[-1])
        out["atlas_dyn"] = jax.image.resize(
            t.astype(jnp.float32), shape, "linear").astype(t.dtype)
        self.geom = self.base_geom.scaled(nh, nw)
        return out

    # ------------------------------------------------------------------
    def render(self, params, h, w, extrins, intrins, ts,
               training=False, rng=None):
        """Render frames `ts` from one view (B must be 1, like the
        reference's raster path, MPV.py:388 'batching not supported').

        Returns (rgb (F, h, w, 3), variables).  Parity: MPV.py:351-475.
        """
        cfg = self.cfg
        coords = R.warp_coordinates(self.geom, extrins, intrins, h, w)
        sample_coords = coords
        if cfg.add_uv_noise and training and rng is not None:
            rng, sub = jax.random.split(rng)
            sample_coords = R.add_texel_noise(coords, sub)

        act_rgb = ACTIVATIONS[cfg.rgb_activate]
        act_a = ACTIVATIONS[cfg.alpha_activate]

        def decode(feats, valid):
            rgba = decode_rgba(feats.astype(jnp.float32),
                               cfg.rgb_mlp_type, None)
            rgb = act_rgb(rgba[..., :-1]) * valid[..., None]
            alpha = jnp.where(valid, act_a(rgba[..., -1]), 0.0)
            return rgb, alpha

        if self.is_sparse:
            k_s, fu, fv = R.tile_lookup(
                self.geom, jnp.asarray(self.tile_map_static), sample_coords)
            k_d, _, _ = R.tile_lookup(
                self.geom, jnp.asarray(self.tile_map_dyn), sample_coords)
            vals_s, hit_s = R.sample_sparse(params["atlas"], k_s, fu, fv)
            dyn_tiles = params["atlas_dyn"][ts]        # (F, Nd, th, tw, 4)
            vals_d, hit_d = R.sample_sparse_video(dyn_tiles, k_d, fu, fv)
            rgb_s, alpha_s = decode(vals_s, coords.valid & hit_s)
            rgb_d, alpha_d = decode(vals_d[:, 0],
                                    (coords.valid & hit_d)[0])
            # (F, D, h, w, .) frame stacks; static broadcasts over frames
            hd = hit_d[0][None, ..., None]
            rgb_p = jnp.where(hd, rgb_d, rgb_s[0][None])
            alpha_p = jnp.where(hd[..., 0], alpha_d, alpha_s[0][None])
        else:
            dyn = params["atlas_dyn"][ts]              # (F, D, Ht, Wt, 4)
            vals = jax.vmap(
                lambda a: R.sample_dense(a, sample_coords))(dyn)
            rgb_p, alpha_p = decode(vals[:, 0], coords.valid[0][None])

        out_rgb, bw = R.composite_planes(alpha_p, rgb_p)
        alpha_sum = jnp.sum(bw, axis=1)
        bg = None
        if cfg.bg_color:
            from videoloop3d_tpu.models.mpmesh import parse_bg_color
            bg = parse_bg_color(cfg.bg_color, rng)
        out_rgb = R.apply_background(out_rgb, alpha_sum, bg)

        disp = None
        if cfg.d_smooth_on:
            # stage 2 uses raw reciprocal depth (MPV.py:386), frame axis
            # as batch
            z = jnp.where(coords.valid, coords.zview, 1.0)[0]
            d = jnp.where(coords.valid[0], 1.0 / z, 0.0)
            disp = jnp.sum(d[None] * bw, axis=1)

        variables = {
            "alpha_planes": alpha_p,       # (F, D, h, w)
            "rgb_planes": rgb_p,
            "blend_weight": bw,
            "alpha": alpha_sum,
            "disp": disp,
        }
        return out_rgb, variables

    # ------------------------------------------------------------------
    def training_extras(self, variables, loss_gain=1.0):
        """Regularizer terms (ref MPV.py:511-551)."""
        cfg = self.cfg
        extra = {}
        a = variables["alpha_planes"]
        if cfg.sparsity_on:
            extra["sparsity"] = regs.sparsity_loss(
                a, self.geom.n_planes, eps=1e-4) * loss_gain
        if cfg.rgb_smooth_on:
            extra["rgb_smooth"] = regs.content_smooth_loss(
                variables["rgb_planes"]) * loss_gain
        if cfg.a_smooth_on:
            extra["a_smooth"] = regs.content_smooth_loss(
                a[..., None]) * loss_gain
        if cfg.density_on:
            extra["density"] = regs.density_loss(variables["alpha"])
        if cfg.d_smooth_on and variables["disp"] is not None:
            extra["d_smooth"] = regs.depth_smooth_loss(variables["disp"])
        return extra
