import pytest


@pytest.fixture(scope="session")
def spark():
    from py_evalfilter_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from py_evalfilter_spark.datagen import make_transcripts

    return make_transcripts(n_convs=40, seed=42)


@pytest.fixture(scope="session")
def profiles_pdf(transcripts_pdf):
    from py_evalfilter_spark.datagen import make_profile_events

    return make_profile_events(transcripts_pdf)


@pytest.fixture(scope="session")
def transcripts_sdf(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf)


@pytest.fixture(scope="session")
def profiles_sdf(spark, profiles_pdf):
    return spark.createDataFrame(profiles_pdf)
