from .hostio import to_host, host_complex
