"""MPMesh — the stage-1 model: static MPI + learned 3D loop mask.

State is a pytree of parameters plus hashable static config; all render /
loss code is pure so it jits cleanly.  Two phases:

* dense:  per-plane textures ``atlas (D, Ht, Wt, C)`` and loop-mask
  textures ``atlas_mask (D, Ht, Wt, 1)``  (ref MPI.py:95-120).
* sparse (after tile culling): packed static/dynamic tile textures with
  per-plane int32 tile maps (ref MPI.py:289-442 `sparsify_faces`).

Rendering is the homography plane sweep (see render/renderer.py) —
mathematically identical to the reference's rasterize+UV path for
fronto-parallel planes.  Vertex optimization (`optimize_geo`) IS wired:
render/geo_warp.py warps the sample grid by the per-plane vertex offsets
and train/stage1.py:449-470 schedules the geometry phase (ref
config_parser.py:153-156; disabled in every shipped reference config via
optimize_geo_start=1e7, same default here).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from videoloop3d_tpu.core.activations import ACTIVATIONS, ALPHA_INIT_VAL
from videoloop3d_tpu.core import cameras, sh
from videoloop3d_tpu.losses import regularizers as regs
from videoloop3d_tpu.models.geometry import MPIGeometry
from videoloop3d_tpu.render import renderer as R


def _atlas_channels(rgb_mlp_type, atlas_cnl=4):
    if rgb_mlp_type == "direct":
        return 4
    if rgb_mlp_type == "rgb_sh":
        return 3 * 4 + 1          # 4 SH coeffs per color + alpha (ref MPI.py:106)
    if rgb_mlp_type == "rgba_sh":
        return 4 * 9              # ref MPV.py:117
    if rgb_mlp_type in ("nex_rgb", "mlp_alpha"):
        return max(int(atlas_cnl), 4)
    raise ValueError(f"unknown rgb_mlp_type {rgb_mlp_type}")


def init_decoder_params(rgb_mlp_type, atlas_cnl, seed=0):
    """Learnable view-conditioned decoder weights (the NeX / MLP family,
    ref utils_mpi.py:8-47).  None for parameter-free decoders."""
    rng = np.random.default_rng(seed)

    def dense(n_in, n_out):
        scale = np.sqrt(2.0 / n_in)
        return {"w": jnp.asarray(
                    rng.normal(0, scale, (n_in, n_out)).astype(np.float32)),
                "b": jnp.zeros((n_out,), jnp.float32)}

    if rgb_mlp_type == "nex_rgb":
        # basis MLP: view dir -> per-feature RGB basis (ref NeX_RGB,
        # utils_mpi.py:35-47; alpha is texel channel 0)
        return {"l0": dense(3, 64), "l1": dense(64, 3 * (atlas_cnl - 1))}
    if rgb_mlp_type == "mlp_alpha":
        # direct MLP: (texel feats [1:], view) -> rgb (ref
        # Feat2RGBMLP_alpha, utils_mpi.py:8-17; alpha is channel 0)
        return {"l0": dense(atlas_cnl - 1 + 3, 48), "l1": dense(48, 3)}
    return None


def _mlp(decoder, x):
    h = x @ decoder["l0"]["w"] + decoder["l0"]["b"]
    h = jax.nn.relu(h)
    return h @ decoder["l1"]["w"] + decoder["l1"]["b"]


def decode_rgba(feats, rgb_mlp_type, view_dirs=None, decoder=None):
    """Texel features -> raw RGBA (pre-activation).

    feats: (..., C); view_dirs: (..., 3) unit vectors (required for
    view-dependent modes); decoder: learnable weights for the NeX/MLP
    family.  Parity: MPI.py feat2rgba / utils_mpi.py:8-75.
    """
    if rgb_mlp_type == "direct":
        return feats[..., :4]
    if rgb_mlp_type == "rgb_sh":
        dim = (feats.shape[-1] - 1) // 3
        base = sh.eval_sh_bases(dim, view_dirs)
        coef = feats[..., :-1].reshape(feats.shape[:-1] + (3, dim))
        rgb = jnp.sum(base[..., None, :] * coef, axis=-1)
        return jnp.concatenate([rgb, feats[..., -1:]], axis=-1)
    if rgb_mlp_type == "rgba_sh":
        dim = 9
        base = sh.eval_sh_bases(dim, view_dirs)
        coef = feats.reshape(feats.shape[:-1] + (4, dim))
        return jnp.sum(base[..., None, :] * coef, axis=-1)
    if rgb_mlp_type == "nex_rgb":
        C = feats.shape[-1]
        basis = _mlp(decoder, jnp.broadcast_to(
            view_dirs, feats.shape[:-1] + (3,)))
        basis = basis.reshape(basis.shape[:-1] + (C - 1, 3))
        rgb = jnp.sum(feats[..., 1:, None] * basis, axis=-2)
        return jnp.concatenate([rgb, feats[..., :1]], axis=-1)
    if rgb_mlp_type == "mlp_alpha":
        vd = jnp.broadcast_to(view_dirs, feats.shape[:-1] + (3,))
        rgb = _mlp(decoder, jnp.concatenate([feats[..., 1:], vd], axis=-1))
        return jnp.concatenate([rgb, feats[..., :1]], axis=-1)
    raise ValueError(rgb_mlp_type)


@dataclasses.dataclass(frozen=True)
class MPMeshConfig:
    rgb_mlp_type: str = "direct"
    atlas_cnl: int = 4
    rgb_activate: str = "sigmoid"
    alpha_activate: str = "sigmoid"
    learn_loop_mask: bool = False
    add_uv_noise: bool = False
    fast_stage1_grad: bool = False
    fast_stage2_grad: bool = False
    fused_render: bool = False
    s1_gemm_prec: str = "highest"      # --s1_gemm_bf16 -> "default"
    s1_fwd_block: tuple = (16, 32)     # --s1_fwd_block
    bg_color: str = ""
    normalize_verts: bool = False
    edge_scale: float = 4.0
    normalize_blendweight_fordepth: bool = False
    sparsity_eps: float = 1e-6
    # extra-loss switches: losses are computed iff weight > 0 at call time;
    # weights themselves live in the training loop (reflection over
    # <name>_loss_weight flags, ref train_3d.py:224-228).
    sparsity_on: bool = True
    rgb_smooth_on: bool = True
    a_smooth_on: bool = True
    d_smooth_on: bool = True
    l_smooth_on: bool = True
    density_on: bool = True

    @staticmethod
    def from_args(args):
        return MPMeshConfig(
            rgb_mlp_type=args.rgb_mlp_type,
            atlas_cnl=int(args.atlas_cnl),
            rgb_activate=args.rgb_activate,
            alpha_activate=args.alpha_activate,
            learn_loop_mask=bool(args.learn_loop_mask),
            add_uv_noise=bool(args.add_uv_noise),
            fast_stage1_grad=bool(getattr(args, "fast_stage1_grad",
                                          False)),
            fast_stage2_grad=bool(getattr(args, "fast_stage2_grad",
                                          False)),
            fused_render=bool(getattr(args, "fused_render", False)),
            s1_gemm_prec=("default"
                          if getattr(args, "s1_gemm_bf16", False)
                          else "highest"),
            s1_fwd_block=tuple(
                int(v) for v in
                getattr(args, "s1_fwd_block", "16x32").split("x")),
            bg_color=args.bg_color,
            normalize_verts=bool(getattr(args, "normalize_verts", False)),
            edge_scale=float(args.edge_scale),
            normalize_blendweight_fordepth=bool(
                args.normalize_blendweight_fordepth),
            sparsity_on=args.sparsity_loss_weight > 0,
            rgb_smooth_on=args.rgb_smooth_loss_weight > 0,
            a_smooth_on=args.a_smooth_loss_weight > 0,
            d_smooth_on=args.d_smooth_loss_weight > 0,
            l_smooth_on=args.l_smooth_loss_weight > 0,
            density_on=args.density_loss_weight > 0,
        )


def parse_bg_color(bg_color: str, rng=None):
    """'' -> None; 'random' -> uniform color; 'r#g#b' -> fixed color."""
    if not bg_color:
        return None
    if bg_color == "random":
        assert rng is not None
        return jax.random.uniform(rng, (3,))
    r, g, b = map(float, bg_color.split("#"))
    return jnp.array([r, g, b], jnp.float32)


def convert_direct_to_sh(model: "MPMesh", params):
    """Convert a 'direct' RGBA atlas into 'rgb_sh' (dc coefficients seeded
    from the direct colors).  Parity: ref MPI.py:273-286 (direct2sh) —
    the reference flags it "not well tested"; same caveat applies.
    Handles both the dense atlas and sparse packed tiles (atlas_dyn).
    Returns new params; model.cfg is swapped to rgb_sh."""
    assert model.cfg.rgb_mlp_type == "direct", \
        f"direct2sh requires a direct atlas, got {model.cfg.rgb_mlp_type}"

    def widen(t):
        t = np.asarray(t, np.float32)
        dim = 4
        out = np.zeros(t.shape[:-1] + (3 * dim + 1,), np.float32)
        out[..., -1] = t[..., -1]
        out[..., 0:-1:dim] = t[..., :3]     # dc coefficient per color
        return jnp.asarray(out)

    new = dict(params)
    new["atlas"] = widen(params["atlas"])
    if "atlas_dyn" in params and len(np.asarray(params["atlas_dyn"])):
        new["atlas_dyn"] = widen(params["atlas_dyn"])
    model.cfg = dataclasses.replace(model.cfg, rgb_mlp_type="rgb_sh")
    return new


class MPMesh:
    """Stage-1 model container (static config + param initialisation +
    pure functional render/forward)."""

    def __init__(self, args, H, W, ref_extrin, ref_intrin, near, far):
        self.geom = MPIGeometry.create(args, H, W, ref_extrin, ref_intrin,
                                       near, far)
        self.cfg = MPMeshConfig.from_args(args)
        self.H, self.W = H, W
        self.is_sparse = False
        self.has_dyn = False
        self.tile_map_static: Optional[np.ndarray] = None
        self.tile_map_dyn: Optional[np.ndarray] = None
        self.tile_hw: Optional[tuple] = None
        # flipped by the trainer at epoch >= optimize_geo_start (a
        # trace-time switch: the step is rebuilt; ref MPI.py:152-156)
        self.optimize_geometry = False
        # --compact_tiles: static patch-active tile bounds (static, dyn)
        # set by the trainer (render/adjoint.py:active_tile_bound)
        self.active_tiles = None
        # --blocked_lookup: static (Ti, J) scanline span bound set by
        # the trainer (renderer.lookup_span_bound); training-only
        self.lookup_spans = None
        self._adj_cache = {}

    @classmethod
    def from_geometry(cls, geom: MPIGeometry, cfg: MPMeshConfig, H, W):
        obj = cls.__new__(cls)
        obj.geom = geom
        obj.cfg = cfg
        obj.H, obj.W = H, W
        obj.is_sparse = False
        obj.has_dyn = False
        obj.tile_map_static = None
        obj.tile_map_dyn = None
        obj.tile_hw = None
        obj.optimize_geometry = False
        obj.active_tiles = None
        obj.lookup_spans = None
        obj._adj_cache = {}
        return obj

    # ------------------------------------------------------------------
    def init_params(self, seed=0):
        """Random init mirroring ref MPI.py:100-117."""
        g = self.geom
        rng = np.random.default_rng(seed)
        C = _atlas_channels(self.cfg.rgb_mlp_type, self.cfg.atlas_cnl)
        atlas = rng.random((g.n_planes, g.mpi_h, g.mpi_w, C),
                           dtype=np.float32)
        atlas[..., -1] = ALPHA_INIT_VAL
        verts = g.vertex_grid()
        if self.cfg.normalize_verts:           # ref MPI.py:68-70
            depths = g.depths_np()
            verts = (verts.reshape(g.n_planes, -1)
                     / depths[:, None]).reshape(verts.shape)
        params = {
            "atlas": jnp.asarray(atlas),
            "verts": jnp.asarray(verts),
        }
        if self.cfg.learn_loop_mask:
            params["atlas_mask"] = jnp.full(
                (g.n_planes, g.mpi_h, g.mpi_w, 1), ALPHA_INIT_VAL,
                jnp.float32)
        decoder = init_decoder_params(self.cfg.rgb_mlp_type, C, seed)
        if decoder is not None:
            params["decoder"] = decoder
        return params

    # ------------------------------------------------------------------
    def _adj_samplers(self):
        """Per-tile adjoint samplers for the sparse (post-cull) phase
        (same machinery as MPMeshVid: render/adjoint.py:make_tile_adjoint
        replaces the packed-tile scatter-add backward with per-tile
        window slices + MXU weight contractions; exact)."""
        from videoloop3d_tpu.render import adjoint as ADJ
        # the samplers bake in tile_positions(tile_map_*) — key on the
        # map identities too so a re-cull / checkpoint reload at the same
        # geometry can't serve stale packed-tile positions
        act = self.active_tiles
        key = (self.geom, id(self.tile_map_static), id(self.tile_map_dyn),
               act)
        if key not in self._adj_cache:
            win = ADJ.tile_window_for(self.geom, (self.H, self.W))
            span = self.geom.tile_span
            # the value keeps the keyed map ARRAYS alive so a reload
            # can never recycle their id()s into a stale cache hit
            self._adj_cache[key] = (
                self.tile_map_static, self.tile_map_dyn,
                ADJ.make_tile_adjoint(
                    ADJ.tile_positions(self.tile_map_static), span, win,
                    active_t=act[0] if act else None),
                ADJ.make_tile_adjoint(
                    ADJ.tile_positions(self.tile_map_dyn), span, win,
                    active_t=act[1] if act else None))
        return self._adj_cache[key][2:]

    # ------------------------------------------------------------------
    def _decode(self, feats, coords, intrins, extrins, decoder=None):
        """Apply texel decode + activations + validity masking.
        feats: (B, D, H, W, C) raw; returns rgb, alpha (activated&masked)."""
        cfg = self.cfg
        view_dirs = None
        if cfg.rgb_mlp_type != "direct":
            B, _, H, W = coords.x.shape
            poses = cameras.pose_to_extrinsic(extrins)
            dirs = []
            for b in range(B):  # B is tiny & static
                _, d = cameras.get_rays(H, W, intrins[b], poses[b])
                dirs.append(d)
            dirs = jnp.stack(dirs)
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            view_dirs = dirs[:, None]                     # broadcast planes
        rgba = decode_rgba(feats, cfg.rgb_mlp_type, view_dirs, decoder)
        rgb = ACTIVATIONS[cfg.rgb_activate](rgba[..., :-1])
        alpha = ACTIVATIONS[cfg.alpha_activate](rgba[..., -1])
        alpha = jnp.where(coords.valid, alpha, 0.0)
        rgb = rgb * coords.valid[..., None]
        return rgb, alpha

    def _render_fused_dense(self, params, cfg, coords, feats, mask_feats,
                            need_mask, rng):
        """Dense training render through the stage-1 fused custom-vjp
        (render/fused_s1.py).  Returns (rgbl, variables) shaped exactly
        like the unfused path; variables carries 'fused_regs' instead of
        the per-plane stacks (consumed by forward())."""
        from videoloop3d_tpu.render.fused_s1 import (FusedS1Cfg,
                                                     fused_composite_s1)
        want_disp = cfg.d_smooth_on
        if want_disp:
            z = jnp.where(coords.valid, coords.zview, 1.0)
            dinv = (1.0 / z - 1.0 / self.geom.far) \
                / (1.0 / self.geom.near - 1.0 / self.geom.far)
            # zero cotangent contract (see render/fused_s1.py docstring)
            dinv = jax.lax.stop_gradient(
                jnp.where(coords.valid, dinv, 0.0).astype(jnp.float32))
        else:
            dinv = jnp.zeros((1, 1, 1, 1), jnp.float32)
        mf = mask_feats[..., 0] if need_mask \
            else jnp.zeros((1, 1, 1, 1), jnp.float32)
        fcfg = FusedS1Cfg(n_planes=self.geom.n_planes,
                          use_sparsity=cfg.sparsity_on,
                          use_rgb_smooth=cfg.rgb_smooth_on,
                          use_a_smooth=cfg.a_smooth_on,
                          use_l_smooth=cfg.l_smooth_on and need_mask,
                          use_loop=need_mask,
                          want_disp=want_disp,
                          sp_eps=cfg.sparsity_eps)
        out_rgb, alpha_sum, disp, label, regsums = fused_composite_s1(
            fcfg, feats, coords.valid, mf, dinv)
        bg = parse_bg_color(cfg.bg_color, rng)
        out_rgb = R.apply_background(out_rgb, alpha_sum, bg)
        if want_disp and cfg.normalize_blendweight_fordepth:
            disp = disp / jnp.clip(alpha_sum, 1e-10, None)
        variables = {
            "alpha_planes": None, "rgb_planes": None,
            "blend_weight": None, "loop_planes": None,
            "disp_norm": disp, "alpha": alpha_sum,
            "fused_regs": regsums,
        }
        rgbl = out_rgb
        if need_mask:
            rgbl = jnp.concatenate([out_rgb, label], axis=-1)
        return rgbl, variables

    def render(self, params, h, w, extrins, intrins, training=False,
               rng=None):
        """Render (relative-extrinsic) views.  Parity: MPI.py:452-594.

        Returns (rgbl, variables): rgbl (B, h, w, 3[+1 loop label]);
        variables carries per-plane stacks for the regularizers.
        """
        cfg = self.cfg
        if self.optimize_geometry:
            # differentiable vertex-grid warp (ref MPI.py:452-536); the
            # closed-form sweep is the verts == flat special case.  In
            # the sparse phase the warped texel coords feed the SAME
            # packed-tile lookup (the tile maps address the virtual
            # plane, coordinate-source-agnostic) — parity with the
            # reference, whose rasterizer keeps running on the culled
            # quads (MPI.py:452-475).
            from videoloop3d_tpu.render import geo_warp as GW
            coords = GW.warp_coordinates_verts(
                self.geom, params["verts"], extrins, intrins, h, w,
                normalize=cfg.normalize_verts)
        else:
            coords = R.warp_coordinates(self.geom, extrins, intrins, h, w)
        sample_coords = coords
        if cfg.add_uv_noise and training and rng is not None:
            rng, sub = jax.random.split(rng)
            sample_coords = R.add_texel_noise(coords, sub)

        decoder = params.get("decoder")
        # The loop-mask plane is sampled at the same coordinates as the
        # atlas; fusing it in as one extra channel makes it ride the same
        # sampling pass (fwd AND adjoint bwd) instead of paying a second,
        # MXU-hostile C=1 pass (measured 132 -> ~80 ms/step).
        need_mask = cfg.learn_loop_mask and not self.is_sparse
        mask_feats = None
        use_adjoint = (self.cfg.fast_stage1_grad and training
                       and not self.is_sparse
                       and not self.optimize_geometry
                       and not (self.cfg.add_uv_noise and rng is not None))
        if use_adjoint:
            # gather-based atlas gradient (exact; render/adjoint.py)
            from videoloop3d_tpu.render import adjoint as ADJ
            M = ADJ.forward_projection(
                self.geom.depths_np(), self.geom.ref_intrin_mpi_np(),
                extrins, intrins)
            block_hw, tb_hw = ADJ.block_plan_for(
                self.geom, h, w, (self.H, self.W),
                block_hw=cfg.s1_fwd_block)
            grad_plan = ADJ.bwd_block_plan_for(self.geom, h, w,
                                               (self.H, self.W))
            src = params["atlas"]
            if need_mask:
                src = jnp.concatenate([src, params["atlas_mask"]], -1)
            feats = ADJ.sample_dense_blockadj(
                src, sample_coords.x, sample_coords.y, M,
                block_hw, tb_hw, grad_plan, cfg.s1_gemm_prec)
            if need_mask:
                feats, mask_feats = feats[..., :-1], feats[..., -1:]
        elif not self.is_sparse:
            src = params["atlas"]
            if need_mask:
                src = jnp.concatenate([src, params["atlas_mask"]], -1)
            feats = R.sample_dense(src, sample_coords)
            if need_mask:
                feats, mask_feats = feats[..., :-1], feats[..., -1:]
        else:
            feats = None
        if feats is not None:
            # --fused_render (stage-1 dense): decode + composite +
            # loop-mask composite + stack regularizers as ONE custom-vjp
            # (render/fused_s1.py) — kills the autodiff backward of the
            # reverse-cumprod / L1-L2 / |diff| chain (~19 ms of the
            # 57 ms step, ROADMAP item 6).  Orthogonal to the sampler
            # choice (adjoint or gather) and to geo-warp/uv-noise, which
            # only change feats/coords.
            if (training and cfg.fused_render
                    and cfg.rgb_mlp_type == "direct"
                    and cfg.rgb_activate == "sigmoid"
                    and cfg.alpha_activate == "sigmoid"):
                return self._render_fused_dense(
                    params, cfg, coords, feats, mask_feats, need_mask,
                    rng)
            rgb_p, alpha_p = self._decode(feats, coords, intrins, extrins,
                                          decoder)
        if self.is_sparse:
            if training and getattr(self, "lookup_spans", None) is not None:
                k_s, k_d, fu, fv = R.tile_lookup2_blocked(
                    self.geom, self.tile_map_static, self.tile_map_dyn,
                    sample_coords, self.lookup_spans)
            else:
                k_s, k_d, fu, fv = R.tile_lookup2(
                    self.geom, self.tile_map_static, self.tile_map_dyn,
                    sample_coords)
            B = sample_coords.x.shape[0]
            if (cfg.fast_stage1_grad and training and B == 1
                    and not self.optimize_geometry
                    and not (cfg.add_uv_noise and rng is not None)):
                # (uv noise can push a sample into a neighboring tile
                # whose adjoint pixel window may not cover it — mirror
                # the dense gate and take the scatter path instead)
                # post-cull fast path: per-tile adjoint backward (zero
                # scatters), like stage 2 — without it the 21 sparse
                # epochs of the reference schedule pay the scatter-add
                from videoloop3d_tpu.render import adjoint as ADJ
                samp_s, samp_d = self._adj_samplers()
                M = ADJ.forward_projection(
                    self.geom.depths_np(), self.geom.ref_intrin_mpi_np(),
                    extrins, intrins)[0]
                ths, tws = params["atlas"].shape[1:3]
                thd, twd = params["atlas_dyn"].shape[1:3]
                vals_s0, hit_s0 = samp_s(
                    params["atlas"], k_s[0], fu[0] * (tws - 1),
                    fv[0] * (ths - 1), M)
                vals_d0, hit_d0 = samp_d(
                    params["atlas_dyn"], k_d[0], fu[0] * (twd - 1),
                    fv[0] * (thd - 1), M)
                vals_s, hit_s = vals_s0[None], hit_s0[None]
                vals_d, hit_d = vals_d0[None], hit_d0[None]
            else:
                vals_s, hit_s = R.sample_sparse(params["atlas"], k_s,
                                                fu, fv)
                vals_d, hit_d = R.sample_sparse(params["atlas_dyn"], k_d,
                                                fu, fv)
            feats = jnp.where(hit_s[..., None], vals_s, vals_d)
            rgb_p, alpha_p = self._decode(feats, coords, intrins, extrins,
                                          decoder)
            hit = hit_s | hit_d
            alpha_p = jnp.where(hit, alpha_p, 0.0)
            rgb_p = rgb_p * hit[..., None]

        out_rgb, bw = R.composite_planes(alpha_p, rgb_p)
        alpha_sum = jnp.sum(bw, axis=1)

        bg = parse_bg_color(cfg.bg_color, rng)
        out_rgb = R.apply_background(out_rgb, alpha_sum, bg)
        disp = R.normalized_disparity(
            self.geom, coords, bw, cfg.normalize_blendweight_fordepth)

        variables = {
            "alpha_planes": alpha_p,       # (B, D, h, w)
            "rgb_planes": rgb_p,           # (B, D, h, w, 3)
            "blend_weight": bw,
            "disp_norm": disp,
            "alpha": alpha_sum,
            "loop_planes": None,
        }

        rgbl = out_rgb
        if need_mask:
            label_p = jax.nn.sigmoid(mask_feats[..., 0])
            label_p = jnp.where(coords.valid, label_p, 0.0)
            # loop-mask composite uses DETACHED alpha (ref MPI.py:578)
            label, _ = R.composite_planes(
                jax.lax.stop_gradient(alpha_p), label_p[..., None])
            variables["loop_planes"] = label_p
            rgbl = jnp.concatenate([out_rgb, label], axis=-1)
        return rgbl, variables

    def forward(self, params, h, w, tar_extrins, tar_intrins,
                training=False, rng=None):
        """World-space forward: ref MPI.py:596-652."""
        rel = tar_extrins @ jnp.linalg.inv(
            jnp.asarray(self.geom.ref_extrin_np()))[None]
        rgbl, variables = self.render(params, h, w, rel, tar_intrins,
                                      training, rng)
        extra = {}
        if training and variables.get("fused_regs") is not None:
            # --fused_render path: the stack regularizers were computed
            # inside the fused custom-vjp (same formulas; fused_s1.py).
            cfg = self.cfg
            regsums = variables["fused_regs"]
            if cfg.sparsity_on:
                extra["sparsity"] = regsums["sparsity"]
            if cfg.rgb_smooth_on:
                extra["rgb_smooth"] = regsums["rgb_smooth"]
            if cfg.a_smooth_on:
                extra["a_smooth"] = regsums["a_smooth"]
            if cfg.d_smooth_on:
                extra["d_smooth"] = regs.depth_smooth_loss(
                    variables["disp_norm"], rgbl[..., :3], cfg.edge_scale)
            if cfg.l_smooth_on and "l_smooth" in regsums:
                extra["l_smooth"] = regsums["l_smooth"]
            if cfg.density_on:
                extra["density"] = regs.density_loss(variables["alpha"])
            return rgbl, extra
        if training:
            cfg = self.cfg
            a = variables["alpha_planes"]
            if cfg.sparsity_on:
                extra["sparsity"] = regs.sparsity_loss(
                    a, self.geom.n_planes, cfg.sparsity_eps)
            if cfg.rgb_smooth_on:
                extra["rgb_smooth"] = regs.content_smooth_loss(
                    variables["rgb_planes"])
            if cfg.a_smooth_on:
                extra["a_smooth"] = regs.content_smooth_loss(a[..., None])
            if cfg.d_smooth_on:
                extra["d_smooth"] = regs.depth_smooth_loss(
                    variables["disp_norm"], rgbl[..., :3], cfg.edge_scale)
            if cfg.l_smooth_on and variables["loop_planes"] is not None:
                extra["l_smooth"] = regs.content_smooth_loss(
                    variables["loop_planes"][..., None])
            if cfg.density_on:
                extra["density"] = regs.density_loss(variables["alpha"])
        return rgbl, extra
