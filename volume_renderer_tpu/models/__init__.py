"""Scene description pytrees: volumes, camera, lights, render settings."""
