"""Native host engine: C++ codec compiled on demand, bound via ctypes."""
