"""Installed console entry points (pyproject [project.scripts]):

  dfnet-nerf     — stage 1, Histogram-assisted NeRF (reference run_nerf.py)
  dfnet-feature  — stage 2, DFNet feature/pose net (reference run_feature.py)
  dfnet-dm       — stage 3, direct feature matching (reference train.py)

The same code backs the repo-root shims (run_nerf.py / run_feature.py /
train.py) so both a source checkout and an installed package expose the
reference's CLI surface.
"""
