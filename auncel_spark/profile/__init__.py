from auncel_spark.profile.error_profile import ErrorProfile
from auncel_spark.profile.traces import Trace

__all__ = ["ErrorProfile", "Trace"]
