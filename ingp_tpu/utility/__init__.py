"""Preprocessing utilities — ports of the reference's utility/ tools:
plane fitting (RANSAC + LSE), Poisson image blending, video frame IO,
vanishing-point up-vector estimation, and the ocean-wave spectrum
playground (jit spectrum + batched-ifft2 frame synthesis).
"""
from .fit_plane import Plane, plane_lse, plane_ransac
from .poisson_blend import poisson_blending
from .video import extract_frames, assemble_video
from .vanishing_point import estimate_up_vector
from .ocean_wave import (init_spectrum, seed_field, evolve_phase,
                         synthesize, animate_gif)
