"""Custom operators: the pieces Spark doesn't ship built-in.

- ``asof``: generic as-of join (union + conditional window trick)
- ``book``: the order-book stateful kernel (SURVEY.md §2.3 T1–T5)
- ``gaps``: sequence-gap audit (T5 batch form)
"""
