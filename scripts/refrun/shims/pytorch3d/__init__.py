"""pytorch3d shim: the reference's single native dependency
(`rasterize_meshes`, reference utils.py:51-63) backed by this repo's C++
rasterizer (videoloop3d_tpu/csrc/rasterizer.cpp)."""
