from .parser import parse_statement, parse_condition  # noqa: F401
from .compiler import compile_statement, compile_condition, LogContext  # noqa: F401
