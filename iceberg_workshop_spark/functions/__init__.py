"""Scalar function surface and the UDF/UDAF/UDTF family."""
