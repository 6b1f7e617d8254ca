"""Multi-chip sharding: image-tile data parallelism and voxel-brick sharding."""
