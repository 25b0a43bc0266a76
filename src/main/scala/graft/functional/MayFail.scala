package graft.functional

/** Error-carrying computation monad — the engine's composition backbone.
  *
  * Re-expresses the reference's error monad (see reference
  * `thundercats/src/main/scala/com/tao/thundercats/functional/monad.scala:19-72`):
  * an operation either succeeded (`Ok`), failed terminally (`Fail`, which
  * short-circuits every subsequent `map`/`flatMap`), or failed ignorably
  * (`IgnorableFail`, which carries both the error and a usable value and
  * keeps composing).
  *
  * Pure Scala — no Spark dependency — so pipelines stay unit-testable
  * without a session.
  */
sealed abstract class MayFail[+A] extends Serializable {
  def map[B](f: A => B): MayFail[B]
  def flatMap[B](f: A => MayFail[B]): MayFail[B]
  def foreach[U](f: A => U): Unit
  def filter(p: A => Boolean): MayFail[A]
  final def withFilter(p: A => Boolean): MayFail[A] = filter(p)

  def isOk: Boolean
  final def isFailing: Boolean = !isOk
  def getError: Option[Throwable]
  /** Map to an Option, None when terminally failing (reference
    * `monad.scala` `mapOpt`). */
  final def mapOpt[B](f: A => B): Option[B] = toOption.map(f)
  def get: A
  def getOrElse[B >: A](default: => B): B
  def toOption: Option[A]
  def toEither: Either[Throwable, A]

  /** Fall back to another computation when failing terminally. */
  def orElse[B >: A](alt: => MayFail[B]): MayFail[B]

  /** Downgrade a terminal `Fail` to an `IgnorableFail` carrying `default`. */
  def ignoreWith[B >: A](default: => B): MayFail[B]
}

final case class Ok[A](value: A) extends MayFail[A] {
  override def map[B](f: A => B): MayFail[B] = MayFail(f(value))
  override def flatMap[B](f: A => MayFail[B]): MayFail[B] =
    try f(value)
    catch { case scala.util.control.NonFatal(e) => Fail(e) }
  override def foreach[U](f: A => U): Unit = f(value)
  override def filter(p: A => Boolean): MayFail[A] =
    if (p(value)) this
    else Fail(new NoSuchElementException("MayFail.filter predicate failed"))
  override def isOk: Boolean = true
  override def getError: Option[Throwable] = None
  override def get: A = value
  override def getOrElse[B >: A](default: => B): B = value
  override def toOption: Option[A] = Some(value)
  override def toEither: Either[Throwable, A] = Right(value)
  override def orElse[B >: A](alt: => MayFail[B]): MayFail[B] = this
  override def ignoreWith[B >: A](default: => B): MayFail[B] = this
}

final case class Fail(error: Throwable) extends MayFail[Nothing] {
  override def map[B](f: Nothing => B): MayFail[B] = this
  override def flatMap[B](f: Nothing => MayFail[B]): MayFail[B] = this
  override def foreach[U](f: Nothing => U): Unit = ()
  override def filter(p: Nothing => Boolean): MayFail[Nothing] = this
  override def isOk: Boolean = false
  override def getError: Option[Throwable] = Some(error)
  override def get: Nothing = throw error
  override def getOrElse[B >: Nothing](default: => B): B = default
  override def toOption: Option[Nothing] = None
  override def toEither: Either[Throwable, Nothing] = Left(error)
  override def orElse[B >: Nothing](alt: => MayFail[B]): MayFail[B] = alt
  override def ignoreWith[B >: Nothing](default: => B): MayFail[B] =
    IgnorableFail(error, default)
}

/** A failure that still produced a usable value; composition continues. */
final case class IgnorableFail[A](error: Throwable, value: A)
    extends MayFail[A] {
  override def map[B](f: A => B): MayFail[B] =
    try IgnorableFail(error, f(value))
    catch { case scala.util.control.NonFatal(e) => Fail(e) }
  override def flatMap[B](f: A => MayFail[B]): MayFail[B] =
    // reference semantics (monad.scala:54-58): the carried error is
    // DROPPED once the continuation succeeds — an ignorable failure is
    // forgiven by the next successful step
    try f(value)
    catch { case scala.util.control.NonFatal(e) => Fail(e) }
  override def foreach[U](f: A => U): Unit = f(value)
  override def filter(p: A => Boolean): MayFail[A] =
    if (p(value)) this
    else Fail(new NoSuchElementException("MayFail.filter predicate failed"))
  override def isOk: Boolean = false
  override def getError: Option[Throwable] = Some(error)
  override def get: A = value
  // reference quirk (monad.scala:62): getOrElse on an ignorable failure
  // yields the DEFAULT even though a value is carried (get returns it)
  override def getOrElse[B >: A](default: => B): B = default
  override def toOption: Option[A] = Some(value)
  override def toEither: Either[Throwable, A] = Right(value)
  override def orElse[B >: A](alt: => MayFail[B]): MayFail[B] = this
  override def ignoreWith[B >: A](default: => B): MayFail[B] = this
}

object MayFail {
  /** Capture exceptions from a thunk into the monad. */
  def apply[A](a: => A): MayFail[A] =
    try Ok(a)
    catch { case scala.util.control.NonFatal(e) => Fail(e) }

  def fromEither[A](e: Either[Throwable, A]): MayFail[A] =
    e.fold(Fail(_), Ok(_))

  def fromOption[A](o: Option[A], ifEmpty: => Throwable): MayFail[A] =
    o.fold[MayFail[A]](Fail(ifEmpty))(Ok(_))

  /** Sequence a list of computations; first terminal failure wins. */
  def sequence[A](xs: Seq[MayFail[A]]): MayFail[Seq[A]] =
    xs.foldLeft[MayFail[Vector[A]]](Ok(Vector.empty)) { (acc, x) =>
      acc.flatMap(v => x.map(v :+ _))
    }
}
