from processor_spark.plans.asserts import explain_str, assert_in_plan, assert_not_in_plan

__all__ = ["explain_str", "assert_in_plan", "assert_not_in_plan"]
