"""Operator library: reusable DataFrame→DataFrame algorithms.

Each module documents the reference behavior it generalizes (file:line in
/root/reference) and carries a *Scale* note describing shuffle structure
and 100 TB behavior.
"""
