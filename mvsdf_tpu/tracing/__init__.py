from .sphere_trace import TracerConfig, trace_rays, TraceResult
