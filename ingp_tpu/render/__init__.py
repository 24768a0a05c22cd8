from .offline import render_for_test, render_chunks
from .panorama import render_panorama, sample_panorama
from .mesh import extract_mesh, marching_cubes
