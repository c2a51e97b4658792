"""40k-iteration schedule with 1k linear warmup
(reference configs/_base_/schedules/schedule_40k.py:1-11)."""

config = dict(
    _base_=["default_40k.py"],
    optimizer=dict(warmup_steps=1000),
)
