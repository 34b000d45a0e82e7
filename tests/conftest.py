import sys

import pytest

sys.path.insert(0, "/root/repo")

from enterprise_sales_data_pipeline_using_aws_lambda_spark.session import (  # noqa: E402
    get_spark,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture()
def sales_rows():
    """Five valid sales rows matching the reference's 14-column contract."""
    def row(uuid, country, units, price, cost, od="1/4/2014", sd="1/12/2014"):
        revenue = units * price
        total_cost = units * cost
        return {
            "uuid": uuid,
            "Country": country,
            "ItemType": "Cereal",
            "SalesChannel": "Online",
            "OrderPriority": "H",
            "OrderDate": od,
            "Region": "Europe",
            "ShipDate": sd,
            "UnitsSold": units,
            "UnitPrice": price,
            "UnitCost": cost,
            "TotalRevenue": revenue,
            "TotalCost": total_cost,
            "TotalProfit": revenue - total_cost,
        }

    return [
        row(1, "Germany", 100, 10.0, 6.0),
        row(2, "Germany", 200, 10.0, 6.0),
        row(3, "France", 50, 20.0, 15.0, od="12/31/2016", sd="1/23/2017"),
        row(4, "France", 75, 20.0, 15.0),
        row(5, "Japan", 10, 5.0, 4.0),
    ]


@pytest.fixture()
def sales_df(spark, sales_rows):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.schema import (
        sales_ingest_schema,
    )

    return spark.createDataFrame(sales_rows, schema=sales_ingest_schema())
