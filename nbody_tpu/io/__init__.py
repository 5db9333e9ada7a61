from nbody_tpu.io.csv import read_bodies, write_frames, format_frame

__all__ = ["read_bodies", "write_frames", "format_frame"]
