from nbody_tpu.utils.fixtures import random_cloud, write_fixture

__all__ = ["random_cloud", "write_fixture"]
