"""Scalar and text function surface.

The reference has no function library — docs use plain Python
(``str.split``/``lower`` inside mappers, docs.rst:143-145).  Here the
equivalents are JVM-side builtins (whole-stage codegen'd), with pandas
UDFs reserved for genuinely non-SQL logic.
"""
