from .trim import amplitude_to_db, frame, frames_to_samples, power_to_db, rms, trim

__all__ = ["amplitude_to_db", "frame", "frames_to_samples", "power_to_db", "rms", "trim"]
