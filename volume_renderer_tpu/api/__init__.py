"""User-facing session/API layer (the MATLAB VolumeRender equivalent)."""
