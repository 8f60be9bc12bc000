"""Error taxonomy shared by the serving surface.

``ClientError`` marks a failure caused by invalid CLIENT-supplied input
(out-of-range sampling params, unknown chat template, bad placeholder
count). The HTTP layer maps it to 400 without a server-side stack trace;
every other exception — including plain ``ValueError`` from model-side
bugs — is a server fault: logged and returned as 500.

Subclasses ``ValueError`` so library callers that validate inputs directly
(engine.submit, encode_chat_prompt) keep their documented ValueError
contract.
"""

from __future__ import annotations


class ClientError(ValueError):
    """Invalid client-supplied input; HTTP layer maps this to 400."""
