from raytracinggpu_tpu.core.vec import Vec3  # noqa: F401
from raytracinggpu_tpu.core.rays import RayBatch  # noqa: F401
