"""Scalar/aggregate function library shared by operators.

Everything here compiles to JVM-side Catalyst expressions (whole-stage
codegen); there are no Python UDFs in this package.
"""
