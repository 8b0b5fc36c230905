from spinix_spark.dsl.tokens import Token
from spinix_spark.dsl.parser import ParseError, parse_spec
from spinix_spark.dsl.compiler import CompileError, compile_spec, CompiledSpec

__all__ = [
    "Token",
    "ParseError",
    "parse_spec",
    "CompileError",
    "compile_spec",
    "CompiledSpec",
]
