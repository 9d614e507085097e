from .fast import render_chunk_diff
from .geometry import derive_tri_arrays, scene_with_vertices

__all__ = ["derive_tri_arrays", "render_chunk_diff", "scene_with_vertices"]
