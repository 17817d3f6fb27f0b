! obmd — Fortran bindings for the obmd_tpu engine's C library API
! (native/obmdc.cpp), the analogue of the reference fork's own Fortran
! module (reference code/fortran/lammps.f90 over library.cpp).  A thin
! iso_c_binding layer: open a handle, feed deck commands or files, read
! thermo scalars, gather/scatter per-atom fields in ascending-tag order.
!
! Build:  gfortran -c obmd.f90           (produces obmd.mod + obmd.o)
! Link :  gfortran client.f90 obmd.o -L. -lobmdc -lpython3.12
!
! Example:
!   use obmd
!   type(c_ptr) :: h
!   h = obmd_open()
!   call obmd_file_f(h, "in.deck")
!   print *, obmd_get_natoms(h), obmd_get_thermo_f(h, "temp")
!   call obmd_close(h)
module obmd
  use, intrinsic :: iso_c_binding, only: c_ptr, c_char, c_double, &
       c_long_long, c_int, c_null_char, c_associated, c_f_pointer
  implicit none
  private
  public :: obmd_open, obmd_close, obmd_command_f, obmd_file_f, &
       obmd_get_natoms, obmd_get_thermo_f, obmd_gather_f, &
       obmd_gather_int_f, obmd_scatter_f, obmd_last_error_f

  interface
     function obmd_open() bind(c, name="obmd_open") result(h)
       import :: c_ptr
       type(c_ptr) :: h
     end function obmd_open

     subroutine obmd_close(h) bind(c, name="obmd_close")
       import :: c_ptr
       type(c_ptr), value :: h
     end subroutine obmd_close

     function c_obmd_command(h, line) bind(c, name="obmd_command") &
          result(rc)
       import :: c_ptr, c_char, c_int
       type(c_ptr), value :: h
       character(kind=c_char), intent(in) :: line(*)
       integer(c_int) :: rc
     end function c_obmd_command

     function c_obmd_file(h, path) bind(c, name="obmd_file") result(rc)
       import :: c_ptr, c_char, c_int
       type(c_ptr), value :: h
       character(kind=c_char), intent(in) :: path(*)
       integer(c_int) :: rc
     end function c_obmd_file

     function obmd_get_natoms(h) bind(c, name="obmd_get_natoms") &
          result(n)
       import :: c_ptr, c_long_long
       type(c_ptr), value :: h
       integer(c_long_long) :: n
     end function obmd_get_natoms

     function c_obmd_get_thermo(h, what) bind(c, name="obmd_get_thermo") &
          result(v)
       import :: c_ptr, c_char, c_double
       type(c_ptr), value :: h
       character(kind=c_char), intent(in) :: what(*)
       real(c_double) :: v
     end function c_obmd_get_thermo

     function c_obmd_gather(h, name, out) bind(c, name="obmd_gather") &
          result(rc)
       import :: c_ptr, c_char, c_double, c_int
       type(c_ptr), value :: h
       character(kind=c_char), intent(in) :: name(*)
       real(c_double), intent(out) :: out(*)
       integer(c_int) :: rc
     end function c_obmd_gather

     function c_obmd_gather_int(h, name, out) &
          bind(c, name="obmd_gather_int") result(rc)
       import :: c_ptr, c_char, c_long_long, c_int
       type(c_ptr), value :: h
       character(kind=c_char), intent(in) :: name(*)
       integer(c_long_long), intent(out) :: out(*)
       integer(c_int) :: rc
     end function c_obmd_gather_int

     function c_obmd_scatter(h, name, in, natoms) &
          bind(c, name="obmd_scatter") result(rc)
       import :: c_ptr, c_char, c_double, c_long_long, c_int
       type(c_ptr), value :: h
       character(kind=c_char), intent(in) :: name(*)
       real(c_double), intent(in) :: in(*)
       integer(c_long_long), value :: natoms
       integer(c_int) :: rc
     end function c_obmd_scatter

     function c_obmd_last_error(h) bind(c, name="obmd_last_error") &
          result(p)
       import :: c_ptr
       type(c_ptr), value :: h
       type(c_ptr) :: p
     end function c_obmd_last_error
  end interface

contains

  ! Fortran-friendly wrappers: trim + NUL-terminate strings.

  function obmd_command_f(h, line) result(rc)
    type(c_ptr), value :: h
    character(len=*), intent(in) :: line
    integer :: rc
    rc = int(c_obmd_command(h, trim(line)//c_null_char))
  end function obmd_command_f

  function obmd_file_f(h, path) result(rc)
    type(c_ptr), value :: h
    character(len=*), intent(in) :: path
    integer :: rc
    rc = int(c_obmd_file(h, trim(path)//c_null_char))
  end function obmd_file_f

  function obmd_get_thermo_f(h, what) result(v)
    type(c_ptr), value :: h
    character(len=*), intent(in) :: what
    real(c_double) :: v
    v = c_obmd_get_thermo(h, trim(what)//c_null_char)
  end function obmd_get_thermo_f

  ! out must be (3, natoms); tag-ascending order, like
  ! lammps_gather_atoms.
  function obmd_gather_f(h, name, out) result(rc)
    type(c_ptr), value :: h
    character(len=*), intent(in) :: name
    real(c_double), intent(out) :: out(:, :)
    integer :: rc
    rc = int(c_obmd_gather(h, trim(name)//c_null_char, out))
  end function obmd_gather_f

  function obmd_gather_int_f(h, name, out) result(rc)
    type(c_ptr), value :: h
    character(len=*), intent(in) :: name
    integer(c_long_long), intent(out) :: out(:)
    integer :: rc
    rc = int(c_obmd_gather_int(h, trim(name)//c_null_char, out))
  end function obmd_gather_int_f

  function obmd_scatter_f(h, name, in) result(rc)
    type(c_ptr), value :: h
    character(len=*), intent(in) :: name
    real(c_double), intent(in) :: in(:, :)
    integer :: rc
    rc = int(c_obmd_scatter(h, trim(name)//c_null_char, in, &
         int(size(in, 2), c_long_long)))
  end function obmd_scatter_f

  function obmd_last_error_f(h) result(msg)
    type(c_ptr), value :: h
    character(len=256) :: msg
    type(c_ptr) :: p
    character(kind=c_char), pointer :: chars(:)
    integer :: i
    msg = ""
    p = c_obmd_last_error(h)
    if (.not. c_associated(p)) return
    call c_f_pointer(p, chars, [256])
    do i = 1, 256
       if (chars(i) == c_null_char) exit
       msg(i:i) = chars(i)
    end do
  end function obmd_last_error_f

end module obmd
