"""Simulated world: point-obstacle environment, 2D LiDAR, scripted robot."""

from toyslam_tpu.sim.environment import load_environment
from toyslam_tpu.sim.lidar import scan_pose, scan_trajectory
from toyslam_tpu.sim.frontend import simulate, SimulationResult
