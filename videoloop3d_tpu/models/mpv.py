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
from videoloop3d_tpu.models.mpmesh import (MPMeshConfig, _atlas_channels,
                                           decode_rgba)
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
        # --fp16 enables a WORKING bf16 path (the reference's fp16 flag
        # is declared buggy, config_parser.py:32-33): tile textures are
        # gathered in bfloat16 (halving the HBM gather traffic that
        # dominates the step) while decode/composite/loss accumulate in
        # f32.  Parameters stay f32 for optimizer precision.
        self.dtype = jnp.float32
        self.gather_dtype = jnp.bfloat16 if args.fp16 else jnp.float32
        # --fast_stage2_grad: per-tile adjoint samplers, built lazily per
        # geometry (the lod pyramid rescales tile spans); keyed by geom.
        self._adj_cache: dict = {}
        # --compact_hits: static per-pixel hit bound S set by the trainer
        # (render/compact.py:slot_bound); None disables compaction
        self.compact_slots = None
        # --compact_tiles: static patch-active tile bounds (static, dyn)
        # set by the trainer (render/adjoint.py:active_tile_bound); the
        # per-tile adjoint backward then loops over the bound instead of
        # every packed tile.  None disables.
        self.active_tiles = None
        # --blocked_lookup: static (Ti, J) scanline span bound set by
        # the trainer (renderer.lookup_span_bound); the tile-map lookup
        # then fetches one block per (plane, row) instead of one element
        # per (plane, pixel).  None disables; training-only (the bound
        # covers the dataset's views/origins, not arbitrary eval poses).
        self.lookup_spans = None

    # ------------------------------------------------------------------
    # Dynamic-atlas layout: TILE-MAJOR with a trailing frame axis —
    #   sparse: (Nd, th, tw, F, 4);  dense: (D, Ht, Wt, F, 4).
    # One texel holds all frames contiguously, so the renderer's bilinear
    # gather reads lane-aligned F*C-wide rows (see
    # render/sample.py:bilinear_tiles_tilemajor) — ~5x end-to-end step
    # speedup on v5e vs a frame-major stack.
    # ------------------------------------------------------------------
    def init_params(self, seed=0):
        """Scratch init (dense): ref MPV.py:83-110."""
        g = self.base_geom
        rng = np.random.default_rng(seed)
        C = _atlas_channels(self.cfg.rgb_mlp_type, self.cfg.atlas_cnl)
        dyn = rng.standard_normal(
            (g.n_planes, g.mpi_h, g.mpi_w, self.frm_num, C)) * self.init_std
        dyn = dyn.astype(np.float32)
        if self.cfg.rgb_mlp_type == "direct":
            dyn[..., -1] = -2.0
        return {"atlas": jnp.zeros((0, 1, 1, C), self.dtype),
                "atlas_dyn": jnp.asarray(dyn, self.dtype),
                "verts": jnp.asarray(g.vertex_grid())}

    def init_from_stage1(self, ckpt):
        """Consume a stage-1 checkpoint (ref MPV.py:235-288 init_from_mpi).

        Returns params.  Sparse ckpt: static tiles stay static, dynamic
        tiles broadcast over frames.  Dense ckpt: whole atlas becomes the
        dynamic stack, static empty.  The checkpoint's decoder type wins
        over args (a direct2sh-converted ckpt carries SH channels).
        """
        meta, p = ckpt["meta"], ckpt["params"]
        self.base_geom = ckpt["geom"]
        self.geom = ckpt["geom"]
        ck_type = meta.get("extra", {}).get("rgb_mlp_type")
        if ck_type and ck_type != self.cfg.rgb_mlp_type:
            import dataclasses
            print(f"[mpv] adopting rgb_mlp_type={ck_type} from the "
                  f"stage-1 checkpoint (args said "
                  f"{self.cfg.rgb_mlp_type})")
            self.cfg = dataclasses.replace(self.cfg, rgb_mlp_type=ck_type)
        if meta["is_sparse"]:
            self.is_sparse = True
            self.tile_map_static = ckpt["tile_map_static"]
            self.tile_map_dyn = ckpt["tile_map_dyn"]
            self.tile_hw = tuple(meta["tile_hw"])
            self.base_tile_hw = self.tile_hw
            C = p["atlas_dyn"].shape[-1]
            dyn = np.broadcast_to(
                p["atlas_dyn"][..., None, :],
                p["atlas_dyn"].shape[:-1] + (self.frm_num, C)).copy()
            params = {"atlas": jnp.asarray(p["atlas"], self.dtype),
                      "atlas_dyn": jnp.asarray(dyn, self.dtype)}
        else:
            self.is_sparse = False
            C = p["atlas"].shape[-1]
            dyn = np.broadcast_to(
                p["atlas"][..., None, :],
                p["atlas"].shape[:-1] + (self.frm_num, C)).copy()
            params = {"atlas": jnp.zeros((0, 1, 1, C), self.dtype),
                      "atlas_dyn": jnp.asarray(dyn, self.dtype)}
        if "verts" in p:
            params["verts"] = jnp.asarray(p["verts"])
        return params

    def restore_checkpoint(self, ckpt):
        """Restore a stage-2 (mpv) checkpoint into this model; returns
        params.  Used by eval/render tools and auto-resume."""
        meta = ckpt["meta"]
        self.geom = ckpt["geom"]
        extra = meta.get("extra", {})
        base_hw = extra.get("base_mpi_hw")
        self.base_geom = ckpt["geom"].scaled(*base_hw) if base_hw \
            else ckpt["geom"]
        self.is_sparse = meta["is_sparse"]
        self.tile_map_static = ckpt["tile_map_static"]
        self.tile_map_dyn = ckpt["tile_map_dyn"]
        self.tile_hw = tuple(meta["tile_hw"]) if meta["tile_hw"] else None
        base = extra.get("base_tile_hw")
        self.base_tile_hw = tuple(base) if base else self.tile_hw
        if meta.get("frm_num"):
            self.frm_num = int(meta["frm_num"])
        return {k: jnp.asarray(v) for k, v in ckpt["params"].items()}

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
            st = params["atlas"]
            if st.shape[0] > 0:
                out["atlas"] = jax.image.resize(
                    st.astype(jnp.float32),
                    (st.shape[0], nth, ntw, st.shape[-1]),
                    "linear").astype(st.dtype)
            dy = params["atlas_dyn"]
            if dy.shape[0] > 0:
                out["atlas_dyn"] = jax.image.resize(
                    dy.astype(jnp.float32),
                    (dy.shape[0], nth, ntw) + dy.shape[3:],
                    "linear").astype(dy.dtype)
            self.tile_hw = (nth, ntw)
            return out
        # dense phase
        bh, bw = self.base_geom.mpi_h, self.base_geom.mpi_w
        nh, nw = int(bh * factor), int(bw * factor)
        if (nh, nw) == (self.geom.mpi_h, self.geom.mpi_w):
            return params
        out = dict(params)
        t = params["atlas_dyn"]
        out["atlas_dyn"] = jax.image.resize(
            t.astype(jnp.float32), (t.shape[0], nh, nw) + t.shape[3:],
            "linear").astype(t.dtype)
        self.geom = self.base_geom.scaled(nh, nw)
        return out

    # ------------------------------------------------------------------
    def _adj_samplers(self, compacted=False):
        """Per-tile adjoint samplers for the current geometry (cached).

        See render/adjoint.py:make_tile_adjoint — the backward replaces
        the packed-tile scatter-add with per-tile window slices + MXU
        weight contractions; exact (tests/test_adjoint.py).  With
        ``compacted`` the hit-compacted variant is returned (forward
        gathers at slot volume; same backward)."""
        from videoloop3d_tpu.render import adjoint as ADJ
        # key on the tile-map identities too: the samplers bake in
        # tile_positions(tile_map_*), so a reload/re-cull at the same
        # geometry must not serve stale packed-tile positions
        act = self.active_tiles
        key = (self.geom, id(self.tile_map_static), id(self.tile_map_dyn),
               compacted, act)
        if key not in self._adj_cache:
            win = ADJ.tile_window_for(self.geom, (self.H, self.W))
            span = self.geom.tile_span
            make = ADJ.make_tile_adjoint_compacted if compacted \
                else ADJ.make_tile_adjoint
            # the value keeps the keyed map ARRAYS alive so a reload
            # can never recycle their id()s into a stale cache hit
            self._adj_cache[key] = (
                self.tile_map_static, self.tile_map_dyn,
                make(ADJ.tile_positions(self.tile_map_static), span, win,
                     active_t=act[0] if act else None),
                make(ADJ.tile_positions(self.tile_map_dyn), span, win,
                     active_t=act[1] if act else None))
        return self._adj_cache[key][2:]

    def render(self, params, h, w, extrins, intrins, ts,
               training=False, rng=None):
        """Render frames `ts` from one view (B must be 1, like the
        reference's raster path, MPV.py:388 'batching not supported').

        All per-plane stacks live in (D, h, w, F[, C]) layout — the frame
        axis stays minor so the tile-major gathers and every elementwise
        op are lane-aligned; only the final composited image is
        transposed to (F, h, w, 3).  Parity: MPV.py:351-475.
        """
        cfg = self.cfg
        coords = R.warp_coordinates(self.geom, extrins, intrins, h, w)
        sample_coords = coords
        if cfg.add_uv_noise and training and rng is not None:
            rng, sub = jax.random.split(rng)
            sample_coords = R.add_texel_noise(coords, sub)

        act_rgb = ACTIVATIONS[cfg.rgb_activate]
        act_a = ACTIVATIONS[cfg.alpha_activate]
        valid0 = coords.valid[0]                       # (D, h, w)
        compact = False                 # set by the sparse branch below

        view_dirs = None
        if cfg.rgb_mlp_type != "direct":
            # per-pixel unit view directions for the SH decoders
            from videoloop3d_tpu.core import cameras
            pose = cameras.pose_to_extrinsic(extrins)[0]
            _, dirs = cameras.get_rays(h, w, intrins[0], pose)
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        decoder = params.get("decoder")

        def decode(feats, valid):
            """feats (..., C); valid broadcastable to feats[..., 0]."""
            vd = None
            if view_dirs is None and cfg.rgb_mlp_type != "direct":
                # feats is (D,h,w,C) or (D,h,w,F,C): broadcast dirs
                vd = dirs[None] if feats.ndim == 4 else dirs[None, :, :,
                                                            None]
            rgba = decode_rgba(feats.astype(jnp.float32),
                               cfg.rgb_mlp_type, vd, decoder)
            rgb = act_rgb(rgba[..., :-1]) * valid[..., None]
            alpha = jnp.where(valid, act_a(rgba[..., -1]), 0.0)
            return rgb, alpha

        if self.is_sparse:
            from videoloop3d_tpu.render.sample import \
                bilinear_tiles_tilemajor
            if training and self.lookup_spans is not None:
                k_s, k_d, fu, fv = R.tile_lookup2_blocked(
                    self.geom, self.tile_map_static, self.tile_map_dyn,
                    sample_coords, self.lookup_spans)
            else:
                k_s, k_d, fu, fv = R.tile_lookup2(
                    self.geom, self.tile_map_static, self.tile_map_dyn,
                    sample_coords)
            atlas_s = params["atlas"].astype(self.gather_dtype)
            dyn = params["atlas_dyn"].astype(self.gather_dtype)
            if ts is not None:                         # None = all frames
                dyn = dyn[..., ts, :]                  # (Nd, th, tw, F, 4)
            th, tw = dyn.shape[1], dyn.shape[2]
            ths, tws = atlas_s.shape[1], atlas_s.shape[2]
            # hit-compaction (render/compact.py): compact the plane axis
            # to the static per-pixel hit bound S — gathers, decode and
            # composite then run at (S, h, w) instead of (D, h, w)
            # (training-only; the eval path keeps the dense sweep)
            S = self.compact_slots
            compact = (training and S is not None
                       and S < self.geom.n_planes)
            if compact:
                from videoloop3d_tpu.render.compact import compact_sweep
                cs = compact_sweep(k_s[0], k_d[0], fu[0], fv[0],
                                   valid0, coords.zview[0], S)
                valid0 = cs.valid                      # (S, h, w) now
            if cfg.fast_stage2_grad and training:
                from videoloop3d_tpu.render import adjoint as ADJ
                samp_s, samp_d = self._adj_samplers(compacted=compact)
                M = ADJ.forward_projection(
                    jnp.asarray(self.geom.depths),
                    jnp.asarray(self.geom.ref_intrin_mpi),
                    extrins, intrins)[0]
                if compact:
                    vals_s0, hit_s0 = samp_s(
                        atlas_s, cs.k_s, cs.fu * (tws - 1),
                        cs.fv * (ths - 1), k_s[0], fu[0] * (tws - 1),
                        fv[0] * (ths - 1), cs.onehot, M)
                    vals_d, hit_d = samp_d(
                        dyn, cs.k_d, cs.fu * (tw - 1), cs.fv * (th - 1),
                        k_d[0], fu[0] * (tw - 1), fv[0] * (th - 1),
                        cs.onehot, M)
                else:
                    vals_s0, hit_s0 = samp_s(
                        atlas_s, k_s[0], fu[0] * (tws - 1),
                        fv[0] * (ths - 1), M)
                    vals_d, hit_d = samp_d(
                        dyn, k_d[0], fu[0] * (tw - 1), fv[0] * (th - 1),
                        M)
            elif compact:
                from videoloop3d_tpu.render.sample import bilinear_tiles
                vals_s0, hit_s0 = bilinear_tiles(
                    atlas_s, cs.k_s, cs.fu * (tws - 1), cs.fv * (ths - 1))
                vals_d, hit_d = bilinear_tiles_tilemajor(
                    dyn, cs.k_d, cs.fu * (tw - 1), cs.fv * (th - 1))
            else:
                vals_s, hit_s = R.sample_sparse(atlas_s, k_s, fu, fv)
                vals_s0, hit_s0 = vals_s[0], hit_s[0]
                vals_d, hit_d = bilinear_tiles_tilemajor(
                    dyn, k_d[0], fu[0] * (tw - 1), fv[0] * (th - 1))
            # --fused_render: one custom-vjp covering decode + select +
            # composite + the stack regularizers; nothing (S,h,w,F[,C])-
            # shaped is materialized or saved (render/fused.py).  Only
            # the shipped direct/sigmoid decoder qualifies.
            if (training and cfg.fused_render
                    and cfg.rgb_mlp_type == "direct"
                    and cfg.rgb_activate == "sigmoid"
                    and cfg.alpha_activate == "sigmoid"):
                from videoloop3d_tpu.render.fused import (FusedCfg,
                                                          fused_composite)
                zv0 = cs.zview if compact else coords.zview[0]
                # fused_composite declares a ZERO cotangent for dinv
                # (its VJP never differentiates through the disparity
                # depths); make that contract explicit here so a future
                # learnable-depth caller can't silently lose gradients.
                dinv = jax.lax.stop_gradient(
                    jnp.where(valid0,
                              1.0 / jnp.where(valid0, zv0, 1.0), 0.0))
                fcfg = FusedCfg(n_planes=self.geom.n_planes,
                                use_sparsity=cfg.sparsity_on,
                                use_rgb_smooth=cfg.rgb_smooth_on,
                                use_a_smooth=cfg.a_smooth_on,
                                want_disp=cfg.d_smooth_on)
                out, alpha_sum, disp, regsums = fused_composite(
                    fcfg, vals_s0, valid0 & hit_s0, vals_d, hit_d,
                    valid0 & hit_d, dinv)
                if cfg.bg_color:
                    from videoloop3d_tpu.models.mpmesh import \
                        parse_bg_color
                    bg = parse_bg_color(cfg.bg_color, rng)
                    if bg is not None:
                        out = out * alpha_sum[..., None] \
                            + bg * (1.0 - alpha_sum[..., None])
                variables = {
                    "alpha_planes": None, "rgb_planes": None,
                    "blend_weight": None, "alpha": alpha_sum,
                    "disp": disp, "fused_regs": regsums,
                    "fused_denorm": vals_d.shape[0] / self.geom.n_planes,
                }
                return jnp.moveaxis(out, 2, 0), variables
            rgb_s, alpha_s = decode(vals_s0, valid0 & hit_s0)
            rgb_d, alpha_d = decode(vals_d, (valid0 & hit_d)[..., None])
            # (D, h, w, F, .) stacks; static broadcasts over the F axis
            hd = hit_d[..., None, None]                # (D, h, w, 1, 1)
            rgb_p = jnp.where(hd, rgb_d, rgb_s[..., None, :])
            alpha_p = jnp.where(hd[..., 0], alpha_d, alpha_s[..., None])
        else:
            from videoloop3d_tpu.render.sample import \
                bilinear_planes_tilemajor
            dyn = params["atlas_dyn"].astype(self.gather_dtype)
            if ts is not None:
                dyn = dyn[..., ts, :]                  # (D, Ht, Wt, F, 4)
            D = dyn.shape[0]
            xs = sample_coords.x[0].reshape(D, -1)
            ys = sample_coords.y[0].reshape(D, -1)
            vals, _ = bilinear_planes_tilemajor(dyn, xs, ys)
            vals = vals.reshape((D, h, w) + vals.shape[-2:])
            rgb_p, alpha_p = decode(vals, valid0[..., None])

        # composite over planes (axis 0, stored far->near): transmittance
        # in front of plane i = prod over nearer planes (j > i) of
        # (1-a_j) — a reverse cumprod along axis 0, shifted to exclusive.
        # No flips/copies of the (D,h,w,F) stacks (they cost ~8ms/step).
        trans = jax.lax.cumprod(1.0 - alpha_p, axis=0, reverse=True)
        trans = jnp.concatenate(
            [trans[1:], jnp.ones_like(trans[:1])], axis=0)
        bw = alpha_p * trans                           # (D, h, w, F) far 1st
        out = jnp.sum(rgb_p * bw[..., None], axis=0)   # (h, w, F, 3)
        alpha_sum = jnp.sum(bw, axis=0)                # (h, w, F)

        bg = None
        if cfg.bg_color:
            from videoloop3d_tpu.models.mpmesh import parse_bg_color
            bg = parse_bg_color(cfg.bg_color, rng)
        if bg is not None:
            out = out * alpha_sum[..., None] \
                + bg * (1.0 - alpha_sum[..., None])

        disp = None
        if cfg.d_smooth_on:
            # stage 2 uses raw reciprocal depth (MPV.py:386)
            zv0 = cs.zview if (self.is_sparse and compact) \
                else coords.zview[0]
            z = jnp.where(valid0, zv0, 1.0)
            d = jnp.where(valid0, 1.0 / z, 0.0)
            disp = jnp.sum(d[..., None] * bw, axis=0)  # both far-first

        out_rgb = jnp.moveaxis(out, 2, 0)              # (F, h, w, 3)
        variables = {
            "alpha_planes": alpha_p,       # (D, h, w, F)
            "rgb_planes": rgb_p,           # (D, h, w, F, 3)
            "blend_weight": bw,            # (D, h, w, F), far-first
                                           # (plane storage order)
            "alpha": alpha_sum,            # (h, w, F)
            "disp": disp,                  # (h, w, F) or None
        }
        return out_rgb, variables

    # ------------------------------------------------------------------
    def training_extras(self, variables, loss_gain=1.0):
        """Regularizer terms (ref MPV.py:511-551) on the (D, h, w, F[,C])
        stacks."""
        cfg = self.cfg
        extra = {}
        if variables.get("fused_regs") is not None:
            # --fused_render path: the stack regularizers were computed
            # inside the fused kernel (same formulas); apply the same
            # scales the unfused path applies below.
            regsums = variables["fused_regs"]
            denorm = variables["fused_denorm"]
            if cfg.sparsity_on:
                extra["sparsity"] = regsums["sparsity"] * loss_gain
            if cfg.rgb_smooth_on:
                extra["rgb_smooth"] = regsums["rgb_smooth"] \
                    * (loss_gain * denorm)
            if cfg.a_smooth_on:
                extra["a_smooth"] = regsums["a_smooth"] \
                    * (loss_gain * denorm)
            if cfg.density_on:
                extra["density"] = regs.density_loss(variables["alpha"])
            if cfg.d_smooth_on and variables["disp"] is not None:
                disp = jnp.moveaxis(variables["disp"], 2, 0)
                extra["d_smooth"] = regs.depth_smooth_loss(disp)
            return extra
        a = variables["alpha_planes"]                  # (L, h, w, F)
        # L = plane-axis length of the stacks: D on the dense sweep, the
        # hit-compacted slot count S under --compact_hits.  The smooth
        # regularizers renormalize by L/mpi_d exactly like the reference
        # does on its truncated fragment stack (MPV.py:518, 524; the
        # rasterizer truncates to the used layer count, utils.py:64-69)
        denorm = a.shape[0] / self.geom.n_planes
        if cfg.sparsity_on:
            # exact under compaction: the L1/L2 ratio ignores the
            # dropped all-zero entries (ref MPI.py:603-607 normalizes by
            # sqrt(mpi_d) regardless of the stack's layer count)
            extra["sparsity"] = regs.sparsity_loss(
                a, self.geom.n_planes, eps=1e-4, plane_axis=0) * loss_gain
        if cfg.rgb_smooth_on:
            extra["rgb_smooth"] = regs.content_smooth_loss(
                variables["rgb_planes"], h_axis=1, w_axis=2) \
                * (loss_gain * denorm)
        if cfg.a_smooth_on:
            extra["a_smooth"] = regs.content_smooth_loss(
                a[..., None], h_axis=1, w_axis=2) * (loss_gain * denorm)
        if cfg.density_on:
            extra["density"] = regs.density_loss(variables["alpha"])
        if cfg.d_smooth_on and variables["disp"] is not None:
            # (h, w, F) -> frame-major (F, h, w) expected by the reg
            disp = jnp.moveaxis(variables["disp"], 2, 0)
            extra["d_smooth"] = regs.depth_smooth_loss(disp)
        return extra
