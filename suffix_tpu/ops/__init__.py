"""Device kernels: construction, LCP, and query engines."""
