"""Application layer: headless frame orchestrator, gaze trajectories,
per-stage profiling, and the CLI (the TPU-native counterpart of the
reference's main.cpp / gui.cpp interactive loop)."""
